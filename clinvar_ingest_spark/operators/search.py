"""Full-text search primitives over the document corpus.

* ``build_inverted_index`` — token -> posting-list build, the classic
  web-index shape.  Three stages, each map-side combinable:
  (doc, token) term frequencies, document frequencies, then posting
  collection — with the stop-word df gate applied BEFORE any
  ``collect_list`` so the skewed heads ('the', punctuation marks) never
  materialize a giant posting array on one task.
* ``keyword_search`` — top-k documents for a small bag of query terms.
  Zero explodes: per-term tf is a codegen ``size(filter(tokens, =))``
  projection, document frequencies come from ONE global aggregate row,
  and term weights use truncating integer division (idf ~ N // df) so
  scores are exact BIGINTs — deterministic across engines and
  partitionings, no float log in the hot path.
* ``bm25_topk`` — the same zero-explode scan shape with the full BM25
  length normalization (k1=6/5, b=3/4) cleared to integer-rational
  arithmetic, so even the length-normalized ranking value-hashes.

Reference analog: the reference has no search layer (it ships rows to
BigQuery); these are the engine additions a webtext corpus needs.
scale: the index build shuffles (token) once and (doc,token) once; the
search is a scan + TakeOrdered, cost O(|docs| * n_terms).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.text import TOKEN_PATTERN


def _tokens(text):
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_ratio: float = 1.0,
    with_postings: bool = True,
) -> DataFrame:
    """token -> (df, cf, top_doc_id, top_tf[, postings]).

    ``df``/``cf`` are document/collection frequency; ``top_doc_id`` is
    the doc with the highest tf (ties -> smallest id).  ``postings``
    (optional) is the full array<struct<doc_id, tf>> sorted by doc_id.

    ``max_df_ratio`` drops tokens appearing in more than that fraction
    of documents (stop words / boilerplate punctuation).  The gate runs
    before posting collection, so the worst-skew keys cost one combined
    count each, never an array build.
    """
    n_docs = docs.count()  # one scalar to the driver
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("_toks"))
        .select("doc_id", F.explode("_toks").alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        # top doc = (tf desc, doc_id asc): max of (tf, -doc_id) struct
        F.max(F.struct(F.col("tf"), (-F.col("doc_id")).alias("nid"))).alias("_top"),
    )
    kept = stats.where(
        (F.col("df") >= F.lit(int(min_df)))
        & (F.col("df") <= F.lit(int(max_df_ratio * n_docs)))
    ).select(
        "token",
        "df",
        "cf",
        (-F.col("_top.nid")).alias("top_doc_id"),
        F.col("_top.tf").alias("top_tf"),
    )
    if not with_postings:
        return kept
    postings = (
        tf.join(kept.select("token"), "token")  # df gate BEFORE collect
        .groupBy("token")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("doc_id"), F.col("tf")))
            ).alias("postings")
        )
    )
    return kept.join(postings, "token")


def keyword_search(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-k docs by summed tf x idf over ``terms``.

    idf is the truncating integer ``n_docs // df`` (0 when df is 0 or
    the term hits every doc carries weight 1): monotone in rarity and
    EXACT — the score column is a BIGINT, so ranking is bit-stable
    across engines, partition counts, and replays.  Tie order is
    (score desc, doc_id asc).

    Plan: one projection computes every per-term tf (codegen
    ``size(filter(...))``, no explode), one global aggregate row yields
    the dfs (collected: len(terms) scalars), then a TakeOrdered top-k.
    """
    terms = list(dict.fromkeys(t.lower() for t in terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    n_docs = docs.count()
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("_toks")
    )
    # NB: the closure must stay single-arg — a `lambda x, t=t:` default
    # makes PySpark's HOF arity sniffing pass (element, index) and bind
    # the term to the array index
    def _tf(term):
        return F.size(F.filter("_toks", lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"_tf{i}") for i, t in enumerate(terms)]
    scored0 = toks.select("doc_id", *tf_cols)
    dfs = scored0.agg(
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ]
    ).first()
    weights = [
        (n_docs // dfs[f"_df{i}"]) if dfs[f"_df{i}"] else 0
        for i in range(len(terms))
    ]
    score = None
    for i in range(len(terms)):
        part = F.col(f"_tf{i}") * F.lit(int(weights[i]))
        score = part if score is None else score + part
    return (
        scored0.select("doc_id", score.cast("long").alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    scale: int = 10_000,
) -> DataFrame:
    """Top-k docs by BM25 (k1 = 6/5, b = 3/4) in EXACT integer-rational
    arithmetic, so the ranking is bit-stable across engines, partition
    counts, and replays (the same trick as ``keyword_search`` but with
    the full Robertson length normalization).

    Per term t:  score_t = idf_t * tf * (k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    with avgdl = L/N (L = corpus token count, N = corpus doc count).
    Clearing every fraction by multiplying through by 10*L:

        score_t = (22 * L * idf_t * scale * tf)
                  DIV (10*L*tf + 3*L + 9*N*dl)

    idf_t is the truncating ``N // df_t`` (monotone in rarity; same
    form as ``keyword_search``), DIV is truncating integer division
    (identical in Spark and DuckDB), and ``scale`` keeps resolution
    through the division.  Every intermediate is a BIGINT; a driver-side
    guard raises when the worst-case numerator (22*L*maxdl*max_idf*scale)
    would not fit in int64 — at that scale production ranking would use
    float BM25 (ranking tolerates fp), this form is the cross-engine
    exact shape.

    Plan: one projection computes dl + every per-term tf (codegen
    ``size(filter(...))``, no explode), ONE global aggregate row yields
    (dfs, N, L, maxdl), then a TakeOrdered top-k.  No shuffle beyond the
    single aggregate; the corpus is scanned twice (stats, scoring).
    """
    terms = list(dict.fromkeys(t.lower() for t in terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    if scale <= 0:
        raise ValueError("scale must be positive")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("_toks")
    )

    def _tf(term):
        return F.size(F.filter("_toks", lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"_tf{i}") for i, t in enumerate(terms)]
    scored0 = toks.select(
        "doc_id", F.size("_toks").cast("long").alias("_dl"), *tf_cols
    )
    stats = scored0.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_l"),
        F.max("_dl").alias("_maxdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    ).first()
    n_docs, total_len = int(stats["_n"]), int(stats["_l"] or 0)
    maxdl = int(stats["_maxdl"] or 0)
    if n_docs == 0 or total_len == 0:
        return scored0.select(
            "doc_id", F.lit(0).cast("long").alias("score")
        ).limit(0)
    idfs = [
        (n_docs // stats[f"_df{i}"]) if stats[f"_df{i}"] else 0
        for i in range(len(terms))
    ]
    max_idf = max(idfs) if idfs else 0
    if max_idf and 22 * total_len * maxdl * max_idf * scale >= 2**63:
        raise ValueError(
            "bm25_topk integer-exact form would overflow int64 at this "
            "corpus size/scale; lower `scale` or use a float BM25"
        )
    # sum_i (num_i DIV den_i): DIV needs expr(), so name the pieces in
    # one projection then fold them in a selectExpr
    pieces = []
    for i in range(len(terms)):
        pieces.append(
            (
                F.lit(int(22 * total_len * idfs[i] * scale))
                * F.col(f"_tf{i}")
            ).alias(f"_num{i}")
        )
        pieces.append(
            (
                F.lit(int(10 * total_len)) * F.col(f"_tf{i}")
                + F.lit(int(3 * total_len))
                + F.lit(int(9 * n_docs)) * F.col("_dl")
            ).alias(f"_den{i}")
        )
    with_parts = scored0.select("doc_id", *pieces)
    sum_expr = " + ".join(
        f"(_num{i} DIV _den{i})" for i in range(len(terms))
    )
    return (
        with_parts.selectExpr(
            "doc_id", f"CAST({sum_expr} AS BIGINT) AS score"
        )
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------
# Incremental index maintenance over the CDC change feed: df and cf
# are counting aggregates, so the inverted index is EXACTLY
# delta-maintainable by the same signed-delta algebra as
# operators/ivm.py (Gupta et al. SIGMOD '93) — an insert image adds
# (+1 df, +tf cf) for each distinct token in the doc, a delete image
# subtracts, and tokens whose df reaches 0 drop out. Refresh cost is
# O(tokens in CHANGED docs), zero base-table reads.
# ---------------------------------------------------------------------

_IVM_PLUS = ("insert", "update_postimage")


def index_deltas(images: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n_rows=df delta, cf=cf delta) for one image batch.

    Per image row, one codegen projection builds the distinct
    (token, tf) pairs (nested HOF, no per-row Python), one explode
    emits them, one map-side-combinable sum folds the batch. The
    output shape matches the maintained state, so batches fold with
    ``ivm.apply_deltas(state, deltas, keys=["token"])``.
    """
    sign = F.when(
        F.col("_change_type").isin(*_IVM_PLUS), F.lit(1)
    ).otherwise(F.lit(-1))
    toks = _tokens(F.col(text_col))
    pairs = F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            t.alias("token"),
            F.size(F.filter(toks, lambda x: x == t)).alias("tf"),
        ),
    )
    return (
        images.select(sign.alias("_s"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.token").alias("token"))
        .agg(
            F.sum("_s").cast("long").alias("n_rows"),
            F.sum(F.col("_s") * F.col("p.tf")).cast("long").alias("cf"),
        )
    )


def maintain_index(
    table, snapshot_ids: list[int], text_col: str = "text"
) -> DataFrame:
    """Replay the (token, df, cf) index across consecutive snapshots
    purely from change feeds — the search-layer twin of
    ``ivm.maintain_view``. Returns the index of the FINAL snapshot,
    built from O(total changed-doc tokens) work; df is exposed under
    its own name (internally maintained as the IVM count column)."""
    from clinvar_ingest_spark.operators.ivm import ROWS_COL, apply_deltas

    state: DataFrame | None = None
    for a, b in zip(snapshot_ids, snapshot_ids[1:]):
        deltas = index_deltas(table.change_feed(a, b), text_col)
        state = deltas if state is None else apply_deltas(
            state, deltas, keys=["token"]
        )
    if state is None:
        raise ValueError("need at least two snapshot ids")
    return state.where(F.col(ROWS_COL) > 0).select(
        "token", F.col(ROWS_COL).alias("df"), "cf"
    )
