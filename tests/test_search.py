"""Full-text search layer (operators/search.py), hashed linear
classifier (operators/classifier.py), and temperature mixture
(operators/curation.py temperature_resample)."""

import math

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.classifier import (
    derived_weights,
    hashed_linear_score,
)
from clinvar_ingest_spark.operators.curation import temperature_resample
from clinvar_ingest_spark.operators.search import (
    bm25_topk,
    build_inverted_index,
    keyword_search,
)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "cat cat cat"),
            (4, ""),
            (5, "dog mat dog"),
        ],
        "doc_id long, text string",
    )


def test_inverted_index_postings(spark, corpus):
    idx = build_inverted_index(corpus).orderBy("token")
    rows = {r["token"]: r for r in idx.collect()}
    cat = rows["cat"]
    assert (cat["df"], cat["cf"]) == (2, 4)          # docs 1, 3; 1+3 occurrences
    assert (cat["top_doc_id"], cat["top_tf"]) == (3, 3)
    assert [(p["doc_id"], p["tf"]) for p in cat["postings"]] == [(1, 1), (3, 3)]
    the = rows["the"]
    assert (the["df"], the["cf"]) == (2, 3)
    assert (the["top_doc_id"], the["top_tf"]) == (1, 2)


def test_inverted_index_df_gates(spark, corpus):
    # min_df=2 drops singletons; max_df_ratio=0.5 (cap 2 of 5 docs)
    # keeps df<=2 tokens only — 'sat' df=2 stays, 'on' df=1 dropped
    idx = build_inverted_index(corpus, min_df=2, max_df_ratio=0.5)
    toks = {r["token"] for r in idx.collect()}
    assert "sat" in toks and "cat" in toks
    assert "on" not in toks and "mat" in toks


def test_inverted_index_top_tiebreak(spark):
    # equal tf -> smallest doc_id wins
    d = spark.createDataFrame(
        [(9, "zig"), (4, "zig")], "doc_id long, text string"
    )
    r = build_inverted_index(d).first()
    assert (r["top_doc_id"], r["top_tf"]) == (4, 1)


def test_keyword_search_ranking(spark, corpus):
    # 'cat' df=2 -> w=2; 'dog' df=2 -> w=2 (5 docs)
    out = keyword_search(corpus, ["cat", "dog"], k=10).collect()
    scores = {r["doc_id"]: r["score"] for r in out}
    assert scores == {3: 6, 5: 4, 1: 2, 2: 2}
    # tie between docs 1 and 2 resolves doc_id-asc in the emitted order
    order = [r["doc_id"] for r in out]
    assert order == [3, 5, 1, 2]


def test_keyword_search_k_and_absent_term(spark, corpus):
    out = keyword_search(corpus, ["cat", "unicorn"], k=1).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 3
    with pytest.raises(ValueError):
        keyword_search(corpus, [])


def _bm25_twin(rows, terms, scale=10_000):
    """Python twin of bm25_topk's integer-rational arithmetic."""
    import re

    from clinvar_ingest_spark.functions.text import TOKEN_PATTERN

    toks = {d: re.findall(TOKEN_PATTERN, t.lower()) for d, t in rows}
    n = len(rows)
    total = sum(len(v) for v in toks.values())
    out = {}
    for d, ts in toks.items():
        dl = len(ts)
        s = 0
        for term in terms:
            tf = ts.count(term)
            df = sum(1 for v in toks.values() if term in v)
            idf = n // df if df else 0
            num = 22 * total * idf * scale * tf
            den = 10 * total * tf + 3 * total + 9 * n * dl
            s += num // den
        if s > 0:
            out[d] = s
    return out


def test_bm25_matches_python_twin(spark, corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    want = _bm25_twin(rows, ["cat", "dog"])
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(corpus, ["cat", "dog"], k=10).collect()
    }
    assert got == want
    # length normalization: doc 3 ('cat cat cat', short, tf=3) must
    # outrank doc 1 ('the cat sat on the mat', long, tf=1)
    assert got[3] > got[1]


def test_bm25_guards(spark, corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, [])
    # absurd scale trips the int64 overflow guard
    with pytest.raises(ValueError):
        bm25_topk(corpus, ["cat"], scale=2**60)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(empty, ["cat"]).count() == 0


def test_bm25_partition_invariance(spark, corpus):
    a = bm25_topk(corpus.repartition(1), ["cat", "mat"], k=10).collect()
    b = bm25_topk(corpus.repartition(7), ["cat", "mat"], k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_classifier_exact_and_empty_doc(spark, corpus):
    dim = 512
    w = derived_weights(spark, dim)
    got = {
        r["doc_id"]: (r["score"], r["keep"])
        for r in hashed_linear_score(corpus, w, dim=dim).collect()
    }
    # recompute doc 3 by hand: 3 x weight('cat')
    import hashlib

    def fid(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim

    def wt(i):
        return (
            int(hashlib.md5(f"w0:{i}".encode()).hexdigest()[:8], 16) % 1000001
            - 500000
        )

    assert got[3][0] == 3 * wt(fid("cat"))
    assert got[4] == (0, False)  # empty doc scores exactly bias(0)
    assert all((s > 0) == k for s, k in got.values())


def test_classifier_dim_cap(spark, corpus):
    w = derived_weights(spark, 8)
    with pytest.raises(ValueError):
        hashed_linear_score(corpus, w, dim=1 << 30, max_broadcast_dim=1 << 20)


def test_temperature_resample_quotas(spark):
    # masses 10000 and 100: sqrt-flattening gives 100:10 -> quotas
    # 110*100//110=100 and 110*10//110=10 of target 110
    rows = [(i, "big", 100) for i in range(100)] + [
        (1000 + i, "tail", 1) for i in range(100)
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = temperature_resample(
        d, domain_col="source", weight_col="n_chars", target_total=110
    )
    counts = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert counts == {"big": 100, "tail": 10}
    # deterministic: same pick on re-run, rk dense 1..quota
    a = sorted(map(tuple, out.collect()))
    b = sorted(
        map(
            tuple,
            temperature_resample(
                d, domain_col="source", weight_col="n_chars", target_total=110
            ).collect(),
        )
    )
    assert a == b


def test_temperature_resample_count_mass(spark):
    # no weight_col -> mass = row count; quota never exceeds domain size
    rows = [(i, "a") for i in range(9)] + [(100, "b")]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(d, domain_col="source", target_total=4).collect()
    per = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
    # floor(sqrt(9))=3, floor(sqrt(1))=1, tot=4 -> quotas 3 and 1
    assert per == {"a": 3, "b": 1}
    assert math.isqrt(9) == 3  # documents the sqrt-floor identity used


# ---------------------------------------------------------------------
# Incremental inverted-index maintenance (search.py index_deltas /
# maintain_index): delta-maintained (token, df, cf) must equal a full
# rebuild from the final table state — including updates that change a
# doc's tokens (preimage decrements), deletes that zero out a token
# (it must vanish), and multi-batch folds.
# ---------------------------------------------------------------------

import datetime as dt

from pyspark.sql import types as T

from clinvar_ingest_spark.operators.search import (
    _tokens,
    index_deltas,
    maintain_index,
)
from clinvar_ingest_spark.tables import SnapshotTable

TS = dt.datetime(2020, 1, 1)

_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, seq long, text string, op string"
    )


def _index_table(spark, path):
    t = SnapshotTable(spark, path, "url", 4).create(_SCHEMA)
    t.merge_upsert(
        _batch(
            spark,
            [
                ("u1", TS, 1, "cat cat dog", "insert"),
                ("u2", TS, 2, "dog bird", "insert"),
            ],
        )
    )
    t.merge_upsert(
        _batch(
            spark,
            [
                # u1 rewritten: 'cat' df drops by 1, 'fish' appears
                ("u1", TS + dt.timedelta(1), 3, "fish dog", "update"),
                ("u3", TS, 4, "cat", "insert"),
            ],
        )
    )
    t.merge_upsert(
        _batch(
            spark,
            [
                ("u3", TS + dt.timedelta(2), 5, None, "delete"),  # 'cat' zeroes
            ],
        )
    )
    return t


def _full_index(t):
    toked = t.read().select(
        "url", F.explode(_tokens(F.col("text"))).alias("token")
    )
    return (
        toked.groupBy("token")
        .agg(
            F.count_distinct("url").cast("long").alias("df"),
            F.count(F.lit(1)).cast("long").alias("cf"),
        )
    )


def test_maintain_index_equals_rebuild(spark, tmp_table_dir):
    t = _index_table(spark, tmp_table_dir)
    sids = sorted(t._load_manifest(n)["snapshot_id"] for n in t.history())
    got = {
        r["token"]: (r["df"], r["cf"])
        for r in maintain_index(t, sids).collect()
    }
    want = {
        r["token"]: (r["df"], r["cf"]) for r in _full_index(t).collect()
    }
    assert got == want
    assert got == {"fish": (1, 1), "dog": (2, 2), "bird": (1, 1)}
    assert "cat" not in got  # zero-df token dropped, not lingering


def test_index_deltas_signs(spark):
    images = spark.createDataFrame(
        [
            ("a a b", "insert"),
            ("a c", "update_preimage"),
            ("b", "update_postimage"),
            ("c c", "delete"),
        ],
        "text string, _change_type string",
    )
    d = {
        r["token"]: (r["n_rows"], r["cf"])
        for r in index_deltas(images).collect()
    }
    # a: +1 insert (tf2), -1 preimage (tf1) -> df 0, cf +1
    # b: +1 insert + 1 postimage -> df 2, cf 2
    # c: -1 preimage -1 delete -> df -2, cf -3
    assert d == {"a": (0, 1), "b": (2, 2), "c": (-2, -3)}


# ---------------------------------------------------------------------
# Batch perceptron training (operators/classifier.py train_perceptron)
# ---------------------------------------------------------------------

def _py_perceptron(docs, dim, epochs, lr=1):
    """Pure-Python twin of the batch perceptron (same hashing)."""
    import hashlib
    import re

    def feats(text):
        out = {}
        for tok in re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", text.lower()):
            f = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim
            out[f] = out.get(f, 0) + 1
        return out

    rows = [(d, y, feats(t)) for d, y, t in docs if feats(t)]
    w: dict[int, int] = {}
    hist = []
    for _ in range(epochs):
        mis = [
            (y, x)
            for _, y, x in rows
            if y * sum(c * w.get(f, 0) for f, c in x.items()) <= 0
        ]
        hist.append(len(mis))
        for y, x in mis:
            for f, c in x.items():
                w[f] = w.get(f, 0) + lr * y * c
                if w[f] == 0:
                    del w[f]
    return w, hist


@pytest.fixture()
def labeled(spark):
    data = [
        (1, 1, "good clean prose about cats"),
        (2, 1, "good solid text here"),
        (3, 1, "very good good material"),
        (4, -1, "spam spam buy now"),
        (5, -1, "buy spam cheap now now"),
        (6, -1, "now buy cheap"),
        (7, 1, ""),  # tokenless: no gradient, excluded
    ]
    return data, spark.createDataFrame(
        data, "doc_id long, label long, text string"
    )


def test_perceptron_matches_python_twin(spark, labeled):
    from clinvar_ingest_spark.operators.classifier import train_perceptron

    data, df = labeled
    wdf, hist = train_perceptron(df, dim=64, epochs=4)
    got = {r["feature_id"]: r["w"] for r in wdf.collect()}
    want, want_hist = _py_perceptron(
        [(d, y, t) for d, y, t in data], 64, 4
    )
    assert got == want
    assert hist == want_hist
    # separable toy corpus: training converges to zero mistakes
    assert hist[-1] == 0


def test_perceptron_learned_weights_classify(spark, labeled):
    from clinvar_ingest_spark.operators.classifier import (
        hashed_linear_score,
        train_perceptron,
    )

    _, df = labeled
    wdf, _ = train_perceptron(df, dim=64, epochs=4)
    scored = {
        r["doc_id"]: r["score"]
        for r in hashed_linear_score(df, wdf, dim=64).collect()
    }
    for r in df.where(F.col("text") != "").collect():
        assert r["label"] * scored[r["doc_id"]] > 0


def test_perceptron_partition_invariance(spark, labeled):
    from clinvar_ingest_spark.operators.classifier import train_perceptron

    _, df = labeled
    w1, h1 = train_perceptron(df, dim=64, epochs=3)
    w2, h2 = train_perceptron(df.repartition(7), dim=64, epochs=3)
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))
    assert h1 == h2


def test_perceptron_dim_cap(spark, labeled):
    from clinvar_ingest_spark.operators.classifier import train_perceptron

    _, df = labeled
    with pytest.raises(ValueError):
        train_perceptron(df, dim=1 << 30, max_broadcast_dim=1 << 20)
