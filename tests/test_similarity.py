"""Similarity / ANN / text / multimodal operator tests."""

import hashlib

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.similarity import (
    minhash_signature,
    shingles,
    simhash16,
)
from clinvar_ingest_spark.functions.text import lang_id, quality_score, token_count
from clinvar_ingest_spark.operators.ann import cosine_topk, lsh_cosine_topk
from clinvar_ingest_spark.operators.similarity_dedup import minhash_lsh_dedup


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_shingles_golden(spark):
    df = _docs(spark, ["a b c d", "x y", ""])
    got = {r["doc_id"]: sorted(r["sh"]) for r in
           df.select("doc_id", shingles(F.col("text")).alias("sh")).collect()}
    assert got == {0: ["a b c", "b c d"], 1: [], 2: []}


def test_minhash_matches_python(spark):
    text = "the quick brown fox jumps over the lazy dog"
    toks = text.split()
    sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    want = min(hashlib.md5(f"0|{s}".encode()).hexdigest() for s in sh)
    df = _docs(spark, [text])
    got = df.select(*minhash_signature(shingles(F.col("text")))).collect()[0]["mh0"]
    assert got == want


def test_near_dup_pair_found_exact_dup_jaccard_1(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "alpha beta gamma delta epsilon zeta eta iota"  # 1 shingle differs
    df = _docs(spark, [a, a, b, "completely different words entirely here now"])
    out = {(r["doc_a"], r["doc_b"]): r["jac"] for r in
           minhash_lsh_dedup(df, threshold=0.2).collect()}
    assert out[(0, 1)] == 1.0          # exact dup
    assert 0.5 < out[(0, 2)] < 1.0     # near dup
    assert (0, 3) not in out


def test_simhash_close_for_near_dups(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta " * 4
    b = a + "iota"
    df = _docs(spark, [a, b, "qqq www eee rrr ttt yyy"])
    got = {r["doc_id"]: r["s"] for r in
           df.select("doc_id", simhash16(F.col("text")).alias("s")).collect()}
    ham_ab = bin(got[0] ^ got[1]).count("1")
    ham_ac = bin(got[0] ^ got[2]).count("1")
    assert ham_ab < ham_ac
    assert all(0 <= v < 2**16 for v in got.values())


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk(df, df.filter("vec_id = 0"), k=3).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in out] == [(0, 1), (1, 2), (2, 3)]
    assert out[0]["cos_sim"] == 1.0


def test_lsh_topk_subset_of_exact_bucket(spark):
    import random

    random.seed(7)
    rows = [
        (i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lsh_cosine_topk(df, df.filter("vec_id < 3"), k=5).collect()
    assert {r["query_id"] for r in out} == {0, 1, 2}
    # self is always in its own bucket at rank 1
    top1 = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    assert top1 == {0: 0, 1: 1, 2: 2}


def test_lang_id_rules(spark):
    df = _docs(spark, [
        "the cat and the dog of a house",
        "der hund und die katze ist nicht da",
        "el perro y la casa de los gatos que",
        "le chien et les chats des une maison",
        "你好世界",
        "zzz qqq www",
    ])
    got = [r["l"] for r in df.select("doc_id", lang_id(F.col("text")).alias("l"))
           .orderBy("doc_id").collect()]
    assert got == ["en", "de", "es", "fr", "zh", "unknown"]


def test_quality_and_tokens(spark):
    df = _docs(spark, ["the quick fox.", "x"])
    rows = df.select(
        "doc_id",
        token_count(F.col("text")).alias("n"),
        quality_score(F.col("text")).alias("q"),
    ).orderBy("doc_id").collect()
    assert rows[0]["n"] == 3
    assert 0.0 <= rows[1]["q"] <= rows[0]["q"] <= 1.0


def test_multimodal_features_match_stub(spark):
    from clinvar_ingest_spark.functions.multimodal import (
        decode_stub,
        extract_media_features,
    )

    payloads = [b"hello world", b"", bytes(range(200))]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: (r["n_bytes"], r["first_byte"], r["checksum64"])
           for r in extract_media_features(df).collect()}
    for i, p in enumerate(payloads):
        s = decode_stub(p)
        assert got[i] == (s["n_bytes"], s["first_byte"], s["checksum64"])


def test_lsh_bucket_cap_drops_degenerate_buckets(spark):
    """A boilerplate band value shared by many docs must be dropped by
    the cap — candidate pairs shrink, preventing the quadratic bucket."""
    from clinvar_ingest_spark.operators.similarity_dedup import (
        minhash_lsh_candidates,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    uncapped = minhash_lsh_candidates(docs).count()
    capped = minhash_lsh_candidates(docs, max_bucket=4).count()
    assert capped < uncapped  # the cap actually bit
    assert capped > 0


def test_simhash_near_dup_finds_exact_dups_at_zero(spark):
    """Byte-identical texts have identical 60-bit simhash → hamming 0;
    they must always surface as near-dup pairs."""
    from clinvar_ingest_spark.operators.similarity_dedup import simhash_near_dup

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different text about spark partitions and shuffles"),
        ],
        "doc_id long, text string",
    )
    rows = simhash_near_dup(docs, max_hamming=3).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_hyperplane_bucket_uses_whole_vector(spark):
    """Unlike sign-of-first-dims, flipping a LATE dimension must be able
    to change the hyperplane bucket (the planes span all dims)."""
    from pyspark.sql import functions as F

    from clinvar_ingest_spark.functions.similarity import (
        hyperplane_bucket,
        hyperplane_planes,
    )

    planes = hyperplane_planes(8, 8)
    base = [0.1] * 8
    flipped = [0.1] * 7 + [-50.0]  # only dim 8 differs, massively
    df = spark.createDataFrame(
        [(1, base), (2, flipped)], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", hyperplane_bucket(F.col("embedding"), planes).alias("b")
        ).collect()
    }
    assert got[1] != got[2]


def test_quantize_i8_codes_bounded_and_cosine_close(spark):
    """Int8 codes stay in [-127, 127]; quantized cosine tracks the
    float cosine within ~1e-2 at 64 dims (scale invariance)."""
    from pyspark.sql import functions as F

    from clinvar_ingest_spark.functions.similarity import cosine, quantize_i8

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qz = e.select(
        "vec_id", "embedding",
        quantize_i8(F.col("embedding")).getField("q").alias("q"),
    )
    bounds = qz.select(
        F.max(F.array_max("q")).alias("hi"), F.min(F.array_min("q")).alias("lo")
    ).collect()[0]
    assert bounds["hi"] <= 127 and bounds["lo"] >= -127

    a = qz.filter(F.col("vec_id") == 0).first()
    pair = (
        qz.filter(F.col("vec_id").isin(0, 1))
        .agg(
            F.collect_list("embedding").alias("es"),
            F.collect_list("q").alias("qs"),
        )
        .select(
            cosine(F.element_at("es", 1), F.element_at("es", 2)).alias("cf"),
            cosine(
                F.element_at("qs", 1).cast("array<double>"),
                F.element_at("qs", 2).cast("array<double>"),
            ).alias("cq"),
        )
        .collect()[0]
    )
    assert a is not None
    assert abs(pair["cf"] - pair["cq"]) < 1e-2


def test_pq_codes_reconstruct_own_subspace_best(spark):
    """PQ semantics: every vector's code is the L2-argmin codebook
    entry per subspace; codes are within range; exact-duplicate vectors
    get identical codes."""
    from clinvar_ingest_spark.operators.ann import pq_encode, pq_train

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    m, n_codes = 4, 8
    books = pq_train(emb, dim=64, m=m, n_codes=n_codes)
    assert len(books) == m and all(len(b) == n_codes for b in books)
    codes = pq_encode(emb, books).collect()
    assert len(codes) > 0
    for r in codes:
        for j in range(m):
            assert 0 <= r[f"code_{j}"] < n_codes

    # brute-force verify the argmin for a handful of rows
    import math

    rows = emb.limit(5).collect()
    got = {r["vec_id"]: r for r in codes}
    for row in rows:
        v = [float(x) for x in row["embedding"]]
        for j, book in enumerate(books):
            sub = v[j * 16:(j + 1) * 16]
            dists = [
                (math.dist(sub, cent), code) for code, cent in book
            ]
            want = min(dists)[1]
            assert got[row["vec_id"]][f"code_{j}"] == want, (row["vec_id"], j)


def test_pq_lloyd_refinement_changes_codebooks_deterministically(spark):
    """n_steps>0 runs Lloyd refinement per subspace; repeated calls are
    bit-identical (no RNG anywhere)."""
    from clinvar_ingest_spark.operators.ann import pq_train

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    b0 = pq_train(emb, dim=64, m=2, n_codes=4, n_steps=0)
    b2a = pq_train(emb, dim=64, m=2, n_codes=4, n_steps=2, sample_mod=3)
    b2b = pq_train(emb, dim=64, m=2, n_codes=4, n_steps=2, sample_mod=3)
    assert b2a == b2b
    assert b2a != b0


def test_ivf_pq_recall_and_candidate_representation(spark):
    """IVF-PQ returns plausible neighbors (nonzero overlap with exact
    top-k under quantization+probing) and scores candidates from
    (cell_id, codes) only — sanity for the billion-vector shape."""
    from pyspark.sql import functions as F

    from clinvar_ingest_spark.operators.ann import cosine_topk, ivf_pq_topk

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < 3)
    exact = cosine_topk(emb, q, k=10)
    approx = ivf_pq_topk(emb, q, dim=64, k=10, n_probe=4)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(ap) == set(ex)
    # the synthetic embeddings are near-uniform (weak neighbor
    # structure), so quantization distortion caps per-query overlap —
    # the robust invariants: every query finds ITSELF (its own cell is
    # probed first and its reconstruction stays nearest), and overlap
    # with the exact top-k is nonzero overall
    total = 0
    for qid in ex:
        assert qid in ap[qid], (qid, ap[qid])
        total += len(ex[qid] & ap[qid])
    assert total >= len(ex) + 2, (total, ex, ap)


def test_hll_sketch_accuracy_and_mergeability(spark):
    """HLL: estimate within the ~4.6% (p=9) expected-error envelope of
    the true cardinality, and merging per-partition sketches equals the
    whole-data sketch (register max associativity) — the property that
    makes the 4KB register table a substitute for re-scans at 100 TB."""
    from pyspark.sql import functions as F

    from clinvar_ingest_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    df = spark.range(20000).select((F.col("id") % 7919).alias("v"))
    true_n = 7919
    est = hll_estimate(hll_registers(df, "v")).collect()[0]["estimate"]
    assert abs(est - true_n) / true_n < 0.15  # 3x the 1-sigma envelope

    a = hll_registers(df.filter(F.col("id") < 9000), "v")
    b = hll_registers(df.filter(F.col("id") >= 9000), "v")
    merged = sorted(map(tuple, hll_merge(a, b).collect()))
    whole = sorted(map(tuple, hll_registers(df, "v").collect()))
    assert merged == whole


def test_pq_adc_lut_equals_reconstruction(spark):
    """VERDICT r4 #7: the per-query LUT ADC (m element_at adds per
    candidate) returns the same ranked output as literal
    reconstruction + generic cosine, and the LUT arrays ride the
    broadcast side of the candidate join."""
    from clinvar_ingest_spark.operators.ann import pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 3")
    lut = pq_topk(emb, q, dim=64, k=5, use_lut=True).orderBy(
        "query_id", "rank"
    )
    recon = pq_topk(emb, q, dim=64, k=5, use_lut=False).orderBy(
        "query_id", "rank"
    )
    assert [tuple(r) for r in lut.collect()] == [
        tuple(r) for r in recon.collect()
    ]
    plan = lut._jdf.queryExecution().executedPlan().toString()
    assert "lut_0" in plan and "BroadcastExchange" in plan


def test_cms_overcounts_never_undercounts_and_merges(spark):
    """Count-Min guarantees: est >= true for every key; merging two
    day-sketches equals sketching the union; estimates are exact
    integers."""
    from pyspark.sql import functions as F

    from clinvar_ingest_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
        cms_merge,
    )

    rows1 = [(i % 37,) for i in range(500)] + [(999,)] * 50
    rows2 = [(i % 23,) for i in range(300)]
    d1 = spark.createDataFrame(rows1, "v long")
    d2 = spark.createDataFrame(rows2, "v long")
    both = d1.union(d2)
    keys = both.distinct()
    true = {
        r["v"]: r["n"]
        for r in both.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    est_union = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(cms_counters(both, "v"), keys, "v").collect()
    }
    assert all(est_union[k] >= true[k] for k in true)  # never undercount
    assert est_union[999] >= 50  # heavy hitter visible
    merged = cms_merge(cms_counters(d1, "v"), cms_counters(d2, "v"))
    est_merged = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(merged, keys, "v").collect()
    }
    assert est_merged == est_union  # day-merge == union sketch


def test_hist_quantiles_exact_and_mergeable(spark):
    """Histogram-quantile sketch: merging per-partition sketches equals
    the whole-data sketch (count-sum associativity); the estimate is
    the exclusive upper bound of the target bin, so it is >= the true
    percentile and within one bin width of it; out-of-range values
    clamp into the edge bins instead of vanishing."""
    from pyspark.sql import functions as F

    from clinvar_ingest_spark.operators.sketch import (
        hist_counts,
        hist_merge,
        hist_quantiles,
    )

    # values 0..9999 uniform; bin width 2^6=64, 200 bins
    df = spark.range(10000).select(F.col("id").alias("v"))
    counts = hist_counts(df, "v", lo=0, bin_shift=6, n_bins=200)
    got = {
        r["pct"]: (r["n"], r["est"])
        for r in hist_quantiles(counts, [50, 90, 99], lo=0, bin_shift=6).collect()
    }
    for pct in (50, 90, 99):
        n, est = got[pct]
        true = pct * 100 - 1  # true pct-th percentile of 0..9999
        assert n == 10000
        assert true <= est <= true + 64, (pct, est, true)

    # mergeability: two halves merged == whole
    a = hist_counts(df.filter("v < 4000"), "v", lo=0, bin_shift=6, n_bins=200)
    b = hist_counts(df.filter("v >= 4000"), "v", lo=0, bin_shift=6, n_bins=200)
    merged = sorted(map(tuple, hist_merge(a, b).collect()))
    whole = sorted(map(tuple, counts.collect()))
    assert merged == whole

    # clamping: values below lo / above the top bin land in edge bins
    oob = spark.createDataFrame([(-50,), (10**9,)], "v long")
    bins = sorted(
        r["bin"] for r in hist_counts(oob, "v", lo=0, bin_shift=6, n_bins=200).collect()
    )
    assert bins == [0, 199]


def test_semantic_dedup_chains_and_cells(spark):
    from clinvar_ingest_spark.operators.similarity_dedup import semantic_dedup

    rows = [
        (1, [1.0, 0.0]),    # centroid/cell 1
        (2, [0.0, 1.0]),    # centroid/cell 2
        (3, [0.99, 0.01]),  # ~v1 -> dup (earlier neighbor 1)
        (4, [0.98, -0.02]), # ~v1 -> dup (chain: only id 1 survives)
        (5, [0.10, 0.95]),  # ~v2 -> dup in cell 2
        (6, [-0.90, 0.10]), # cell 2, far from everything -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in semantic_dedup(
        df, n_cells=2, threshold=0.95, centroid_mode="first").collect()}
    assert {i: out[i].is_dup for i in range(1, 7)} == {
        1: False, 2: False, 3: True, 4: True, 5: True, 6: False
    }
    assert out[3].cell_id == out[1].cell_id == 1
    assert out[5].cell_id == out[2].cell_id == 2
    assert out[6].cell_id == 2


def test_ann_recall_counts_and_anchor(spark):
    """Recall@k: hits counted on (query_id, neighbor_id); queries the
    approximate index missed entirely still appear with n_hits 0; the
    basis-point math is exact integer division."""
    from clinvar_ingest_spark.operators.ann import ann_recall

    exact = spark.createDataFrame(
        [(1, n) for n in (10, 11, 12)]
        + [(2, n) for n in (20, 21, 22)]
        + [(3, n) for n in (30, 31, 32)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        # q1: 2 of 3 right; q2: 1 of 3; q3: absent from approx output
        [(1, 10), (1, 11), (1, 99), (2, 22), (2, 98), (2, 97)],
        "query_id long, neighbor_id long",
    )
    got = {
        r["query_id"]: (r["n_hits"], r["recall_bp"])
        for r in ann_recall(exact, approx, k=3).collect()
    }
    assert got == {1: (2, 6666), 2: (1, 3333), 3: (0, 0)}


def test_cross_corpus_neardup_flags_only_cross_pairs(spark):
    """The band join is train x eval: a near-dup pair WITHIN train is
    never flagged; a train doc near-identical to an eval doc is, with
    the exact shingle Jaccard."""
    from clinvar_ingest_spark.operators.similarity_dedup import (
        cross_corpus_neardup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    train = spark.createDataFrame(
        [
            (1, base),                      # leaks eval doc 100
            (2, base + " extra"),           # near-dup of doc 1 (in-train)
            (3, "completely different words about spark partitions"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, base), (101, "unrelated evaluation benchmark prompt")],
        "doc_id long, text string",
    )
    pairs = {
        (r["train_id"], r["eval_id"]): r["jac"]
        for r in cross_corpus_neardup(train, ev, threshold=0.2).collect()
    }
    assert (1, 100) in pairs and pairs[(1, 100)] == 1.0
    assert (2, 100) in pairs and 0.2 <= pairs[(2, 100)] < 1.0
    assert all(t != 3 for t, _ in pairs)
    assert all(e != 101 for _, e in pairs)


def test_cross_corpus_neardup_bucket_cap_and_threshold(spark):
    """max_bucket drops degenerate train-side buckets before the join;
    a high threshold filters verified candidates."""
    from clinvar_ingest_spark.operators.similarity_dedup import (
        cross_corpus_neardup,
    )

    boiler = "copyright footer terms of service apply to this page"
    train = spark.createDataFrame(
        [(i, boiler) for i in range(1, 7)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, boiler)], "doc_id long, text string"
    )
    full = cross_corpus_neardup(train, ev, threshold=0.2).count()
    assert full == 6
    capped = cross_corpus_neardup(
        train, ev, threshold=0.2, max_bucket=3
    ).count()
    assert capped == 0
    strict = cross_corpus_neardup(
        spark.createDataFrame(
            [(1, boiler + " extra words beyond")],
            "doc_id long, text string",
        ),
        ev,
        threshold=0.99,
    ).count()
    assert strict == 0
