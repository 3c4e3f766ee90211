"""Last-writer-wins dedup: keep the top-1 row per key by a version order.

Reference parity: the BigQuery window-rank dedup
``ROW_NUMBER() OVER (PARTITION BY id ORDER BY date_last_updated DESC,
id DESC) ... WHERE row_num = 1`` in
clinvar_ingest/cloud/bigquery/create_tables.py:176-222 (five variants).

The engine generalizes it to ``PARTITION BY url ORDER BY warc_ts DESC,
seq DESC`` and — because a 10^10-event Common-Crawl log has hot urls /
hot domains — offers three physical strategies:

* ``window``          — single global window. Correct, but one straggler
                        task per hot key at scale.
* ``salted_window``   — two-phase: a *local* top-1 per (key, salt) where
                        the salt is a deterministic hash of the version
                        columns, then a *global* top-1 per key over the
                        ≤ n_salts survivors. The heavy first pass never
                        sees more than ~1/n_salts of a hot key's rows in
                        one window group.
* ``max_by``          — ``groupBy(keys).agg(max_by(struct(*), ver))``.
                        Spark plans this as a hash aggregate with a
                        map-side partial, so hot keys are pre-combined
                        before the shuffle — usually the fastest and the
                        default at scale.

All three return identical results when the version order is a total
order per key (for the change log it is: (warc_ts, seq) is unique).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _version_struct(order_cols: Sequence[str]) -> Column:
    # Struct comparison is lexicographic by field, which is exactly the
    # (warc_ts DESC, seq DESC) tiebreak chain when taking the max.
    return F.struct(*[F.col(c) for c in order_cols])


def lww_dedup(
    df: DataFrame,
    key_cols: Sequence[str] = ("url",),
    order_cols: Sequence[str] = ("warc_ts", "seq"),
    strategy: str = "max_by",
    n_salts: int = 16,
) -> DataFrame:
    """Return exactly one row per key: the last writer by ``order_cols``.

    ``order_cols`` must totally order rows within a key (append a unique
    offset column such as ``seq`` to guarantee it); with ties the
    ``window`` strategies keep the first row_number winner, which is
    then also the struct-max — so strategies agree.
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)

    taken = {c.lower() for c in df.columns}

    def _free(name: str) -> str:
        # helper-column hygiene: never clobber a caller column that
        # happens to share a helper's name (nothing reserves "_"-names).
        # Case-insensitive: withColumn/drop resolve names through the
        # session resolver, which is case-insensitive by default, so a
        # caller's "_KH" would still collide with a helper "_kh".
        while name.lower() in taken:
            name += "_"
        return name

    if strategy == "max_by":
        payload = [c for c in df.columns if c not in key_cols]
        ver = _version_struct(order_cols)
        top = _free("_top")
        out = df.groupBy(*key_cols).agg(
            F.max_by(F.struct(*[F.col(c) for c in payload]), ver).alias(top)
        )
        return out.select(*key_cols, *[F.col(f"{top}.{c}").alias(c) for c in payload])

    desc_order = [F.col(c).desc() for c in order_cols]

    if strategy == "window":
        # The window key is PREFIXED with xxhash64(keys): row_number
        # per (hash(k), k) equals row_number per k (the hash is a pure
        # function of the keys), but the sort that feeds the window
        # then leads with an 8-byte NUMERIC prefix instead of a string
        # key — long string keys sharing a common prefix (urls all
        # starting "https://…") otherwise defeat Tungsten's binary
        # prefix comparison and every comparison falls through to a
        # full key compare. Measured on the 6M-event merge dedup:
        # 26.8→18.9 s at local[1], 8.3→6.5 s at local[4], neutral at
        # local[32] (per-task runs too small to matter). Winners are
        # byte-identical (guide §2 per-task work; oracle-verified).
        kh = F.xxhash64(*[F.col(c) for c in key_cols])
        khc, rnc = _free("_kh"), _free("_rn")
        w = Window.partitionBy(khc, *key_cols).orderBy(*desc_order)
        return (
            df.withColumn(khc, kh)
            .withColumn(rnc, F.row_number().over(w))
            .filter(F.col(rnc) == 1)
            .drop(rnc, khc)
        )

    if strategy == "salted_window":
        # Deterministic salt from the version columns: same row → same
        # salt on every replay, so resume/replay equivalence holds.
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salts))
        sc, r1, r2 = _free("_salt"), _free("_rn1"), _free("_rn2")
        w1 = Window.partitionBy(*key_cols, sc).orderBy(*desc_order)
        w2 = Window.partitionBy(*key_cols).orderBy(*desc_order)
        return (
            df.withColumn(sc, salt)
            .repartition(*[F.col(c) for c in key_cols], F.col(sc))
            .withColumn(r1, F.row_number().over(w1))
            .filter(F.col(r1) == 1)
            .withColumn(r2, F.row_number().over(w2))
            .filter(F.col(r2) == 1)
            .drop(sc, r1, r2)
        )

    raise ValueError(f"unknown strategy {strategy!r}")


def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    keep_col: str,
) -> DataFrame:
    """Exact-content dedup: one survivor per identical content tuple.

    Survivor = minimum ``keep_col`` (deterministic). Implemented as a
    hash aggregate (map-side combinable), not a window, so it scales to
    skewed content (e.g. boilerplate pages repeated millions of times).
    """
    return df.groupBy(*[F.col(c) for c in content_cols]).agg(
        F.min(keep_col).alias(keep_col), F.count(F.lit(1)).alias("n_copies")
    )


def remove_duplicate_spans(
    docs: DataFrame,
    span_tokens: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring (sliding-window) duplicate-span removal — the
    Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better" semantic at token granularity: every token position covered
    by ANY ``span_tokens``-gram that occurs more than once corpus-wide
    (across documents OR repeated within one document) is removed from
    EVERY occurrence; the surviving tokens are reassembled in order.
    Unlike :func:`~clinvar_ingest_spark.operators.curation.chunk_dedup`
    (fixed non-overlapping windows, first occurrence kept), the window
    here SLIDES one token at a time, so duplicated passages are caught
    at any alignment.

    Returns ``(doc_id, n_tokens, n_removed, clean_text)``.

    Scale shape: documents are tokenized once into a per-doc word
    array; the sliding windows are fingerprinted IN PLACE with a
    ``transform`` over the array (md5 of the joined window — the rows
    that reach the shuffle carry (doc_id, pos, 32-byte fp), never the
    window text), the global fingerprint count is one
    map-side-combinable aggregate, and duplicated-window starts join
    back by fingerprint (AQE broadcasts the dup set when rare — the
    common case in curated webtext). Coverage expands each duplicated
    start to its ``span_tokens`` positions via ``sequence``+explode,
    distinct per (doc, pos) — worst case O(dup_windows x span_tokens)
    rows, NOT corpus x span — and removal is one LEFT ANTI join on
    (doc, pos) followed by a keyed position-sorted reassembly.
    """
    words = docs.select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("w"),
    ).withColumn(
        "w", F.filter(F.col("w"), lambda x: x != F.lit(""))
    )
    L = int(span_tokens)
    # fingerprints of every L-token window, computed inside the array
    wins = words.select(
        "_id",
        F.posexplode(
            F.when(
                F.size("w") >= L,
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - L),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("w", i + 1, L))),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "fp"),
    )
    dup_fps = (
        wins.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("fp")
    )
    covered = (
        wins.join(dup_fps, "fp")
        .select(
            "_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(L - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    toks = words.select(
        "_id", F.size("w").alias("n_tokens"), F.posexplode("w").alias("tpos", "tok")
    )
    kept = toks.join(covered, ["_id", "tpos"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
    )
    base = words.select("_id", F.size("w").alias("n_tokens"))
    return (
        base.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
