"""Distributed BPE training (operators/bpe.py) vs a pure-Python
reference implementation of the Sennrich merge loop — the learned
merge table, the tie-breaks, and segment application must all match,
and must be invariant to partitioning."""

from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    word_frequencies,
)


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference: greedy left-to-right merge application, argmax pair
    by (count desc, lhs asc, rhs asc)."""
    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, c))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "a ab abab",  # overlap stress: ab ab ab chains
]


def _docs(spark, n_parts=1):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    ).repartition(n_parts)


def _expected(n_merges):
    wf: dict[str, int] = {}
    for t in CORPUS:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    return _py_bpe(wf, n_merges)


def test_bpe_train_matches_reference(spark):
    merges = bpe_train(_docs(spark), n_merges=8).orderBy("step").collect()
    want, _ = _expected(8)
    got = [(r.step, r.lhs, r.rhs, r.merged, r.pair_count) for r in merges]
    assert got == want
    # the classic example learns 'est'-family and 'lo' merges
    assert any(m[3] == "est" for m in got)


def test_bpe_train_partition_invariant(spark):
    a = bpe_train(_docs(spark, 1), n_merges=5).orderBy("step").collect()
    b = bpe_train(_docs(spark, 7), n_merges=5).orderBy("step").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bpe_segment_matches_reference_seqs(spark):
    n = 6
    want_merges, want_seqs = _expected(n)
    pairs = [(m[1], m[2]) for m in want_merges]
    seg = bpe_segment(
        _docs(spark).select(F.col("text").alias("word_src")),
        pairs,
        text_col="word_src",
    ).collect()
    # expected per-doc subwords = concatenation of per-word seqs
    got = {r["word_src"]: r["subwords"] for r in seg}
    for text in CORPUS:
        want = [tok for w in text.split() for tok in want_seqs[w]]
        assert got[text] == want


def test_bpe_early_stop_on_fully_merged(spark):
    docs = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=10).collect()
    # only one merge is learnable ('a'+'b'); loop must stop early
    assert [(r.lhs, r.rhs) for r in merges] == [("a", "b")]


def test_word_frequencies_min_freq_floor(spark):
    wf = {
        r["word"]: r["freq"]
        for r in word_frequencies(_docs(spark), min_freq=4).collect()
    }
    assert wf == {"low": 5, "newest": 6}


def test_bpe_segment_empty_text(spark):
    docs = spark.createDataFrame([(1, ""), (2, "ab")], "doc_id long, text string")
    out = {
        r["doc_id"]: r["subwords"]
        for r in bpe_segment(docs, [("a", "b")]).collect()
    }
    assert out == {1: [], 2: ["ab"]}
