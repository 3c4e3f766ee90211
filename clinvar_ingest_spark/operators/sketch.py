"""Deterministic distributed sketches.

``approx_count_distinct`` (Spark's HLL++) is the built-in path, but
its sketch bytes are engine-private — not oracle-checkable and not
portable to other systems. This module implements a textbook
HyperLogLog whose every intermediate is ENGINE-PORTABLE and exact:

* hash: first 15 hex chars of ``md5`` (60 bits — both engines agree
  byte-for-byte; no xxhash, whose seeds differ per engine),
* register index: low ``p`` bits; rank: leading-zero count of the
  remaining 51 bits via the no-leading-zeros property of ``bin()``
  (pure integer/string ops, no log()),
* registers: ``max`` per bucket — associative and commutative, so the
  sketch is map-side combinable, mergeable across partitions, tables,
  and days (the property that makes sketches THE cardinality tool at
  100 TB: a daily 4 KB register table replaces a re-scan),
* estimate: the harmonic-mean denominator Σ2^(52-Mj) is computed as an
  INTEGER (≤ 512·2^52 < 2^62 — exact, order-independent), so the only
  float op is one final multiply/divide — bit-identical across engines.

Raw HLL estimator (no small/large-range corrections): expected error
~1.04/√m ≈ 4.6 % at p=9. The registers themselves are exact and are
what the oracle hash-gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60  # 15 hex chars of md5


def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, col: Column | str, p: int = 9
) -> DataFrame:
    """(bucket, r) HLL register table for the column's distinct set —
    one small aggregate, map-side combinable, mergeable by max."""
    c = F.col(col) if isinstance(col, str) else col
    m = 1 << p
    hv = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    rest = F.shiftright(hv, p)  # 60-p significant bits
    width = _HASH_BITS - p
    rho = F.when(rest == 0, F.lit(width + 1)).otherwise(
        width - F.length(F.bin(rest)) + 1
    )
    return (
        df.select(F.pmod(hv, F.lit(m)).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Union register tables from any number of sketches (partitions,
    tables, time windows) into one — register max is the only op."""
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    return out.groupBy("bucket").agg(F.max("r").alias("r"))


def hll_estimate(registers: DataFrame, p: int = 9) -> DataFrame:
    """One-row (denom, n_buckets_hit, estimate) from a register table.

    ``denom`` = Σ 2^(scale − Mj) over all m registers, scale =
    width+1 (absent buckets contribute 2^scale) — an exact integer
    ≤ m·2^scale < 2^62, so the harmonic mean never depends on
    summation order."""
    m = 1 << p
    width = _HASH_BITS - p
    scale = width + 1  # max rank; 2^(scale-rho) is integer for rho>=1
    agg = registers.agg(
        # SQL expr: the Python shiftleft() wrapper only takes an int
        # shift amount; the SQL function shifts by an expression
        F.expr(f"sum(shiftleft(cast(1 as bigint), {scale} - r))").alias(
            "denom_hit"
        ),
        F.count(F.lit(1)).alias("n_buckets_hit"),
    )
    denom = (
        F.col("denom_hit")
        + (F.lit(m) - F.col("n_buckets_hit"))
        * F.lit(1 << scale).cast("long")
    )
    est = (
        F.lit(_alpha(m))
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << scale))
        / denom.cast("double")
    )
    return agg.select(
        denom.alias("denom"),
        "n_buckets_hit",
        F.round(est, 2).alias("estimate"),
    )


def hll_sql(col: str, table: str, p: int = 9) -> str:
    """DuckDB replay of hll_registers + hll_estimate (oracle mirror) —
    same hash, same integer denominator, same single float expression."""
    m = 1 << p
    width = _HASH_BITS - p
    scale = width + 1
    alpha = _alpha(m)
    return f"""
WITH hv AS (
  SELECT CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT)
           AS h
  FROM {table}
),
regs AS (
  SELECT h % {m} AS bucket,
         max(CASE WHEN (h // {1 << p}) = 0 THEN {width + 1}
                  ELSE {width} - length(bin(h // {1 << p})) + 1 END) AS r
  FROM hv GROUP BY 1
),
agg AS (
  SELECT sum((CAST(1 AS BIGINT) << ({scale} - r)))::BIGINT AS denom_hit,
         count(*) AS n_buckets_hit
  FROM regs
)
SELECT denom_hit + ({m} - n_buckets_hit) * (CAST(1 AS BIGINT) << {scale})
         AS denom,
       CAST(n_buckets_hit AS BIGINT) AS n_buckets_hit,
       round(CAST({alpha!r} AS DOUBLE) * CAST({float(m)!r} AS DOUBLE)
             * CAST({float(m)!r} AS DOUBLE)
             * CAST({float(1 << scale)!r} AS DOUBLE)
             / CAST(denom_hit + ({m} - n_buckets_hit)
                    * (CAST(1 AS BIGINT) << {scale}) AS DOUBLE), 2)
         AS estimate
FROM agg
"""


# -- Count-Min Sketch ----------------------------------------------------
#
# Same portability contract as the HLL above: md5-derived slots, exact
# BIGINT counters, merge = elementwise SUM (associative/commutative →
# map-side combinable, mergeable across partitions, tables, and days).
# d*w counters replace a full per-key count table for heavy-hitter
# queries; estimates only ever OVER-count (min over d rows), never
# under — the property callers rely on for threshold filters.

CMS_D = 4    # hash rows
CMS_W = 512  # counters per row


def _cms_slot(c: Column, i: int, w: int) -> Column:
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(c.cast("string"), F.lit(f"#{i}"))), 1, 15),
            16,
            10,
        ).cast("long"),
        F.lit(w),
    )


def cms_counters(
    df: DataFrame, col: Column | str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """(row_i, slot, cnt) Count-Min counter table over the column's
    values — one explode (×d, constant) + one map-side-combinable
    aggregate. ~d·w BIGINTs regardless of input size."""
    c = F.col(col) if isinstance(col, str) else col
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("row_i"), _cms_slot(c, i, w).alias("slot"))
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("cell"))
        .select("cell.row_i", "cell.slot")
        .groupBy("row_i", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*counters: DataFrame) -> DataFrame:
    """Merge counter tables (days / partitions / tables): elementwise sum."""
    out = counters[0]
    for c in counters[1:]:
        out = out.unionByName(c)
    return out.groupBy("row_i", "slot").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-estimate each key's count: min over its d counters.

    ``keys`` is a (small) DataFrame of candidate keys; each key joins
    to exactly d counter cells on (row_i, slot) — the counter table is
    d·w rows, so Spark broadcasts it and the probe is map-side."""
    c = F.col(col)
    probes = keys.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        _cms_slot(c, i, w).alias("slot"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("cell"),
    ).select(col, "cell.row_i", "cell.slot")
    return (
        probes.join(F.broadcast(counters), ["row_i", "slot"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )


def cms_sql(col: str, table: str, d: int = CMS_D, w: int = CMS_W) -> str:
    """DuckDB replay of cms_counters + cms_estimate over every distinct
    key of ``table.col`` (oracle mirror, exact integers)."""
    slots = ", ".join(
        f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR) || '#{i}'), 1, 15)) "
        f"AS BIGINT) % {w} AS s{i}"
        for i in range(d)
    )
    cell_union = "\nUNION ALL\n".join(
        f"SELECT {i} AS row_i, s{i} AS slot FROM hv" for i in range(d)
    )
    probe_union = "\nUNION ALL\n".join(
        f"SELECT {col}, {i} AS row_i, s{i} AS slot FROM keys" for i in range(d)
    )
    return f"""
WITH hv AS (SELECT {col}, {slots} FROM {table}),
counters AS (
  SELECT row_i, slot, CAST(count(*) AS BIGINT) AS cnt
  FROM ({cell_union}) GROUP BY row_i, slot
),
keys AS (SELECT DISTINCT {col}, {slots} FROM {table}),
probes AS ({probe_union})
SELECT p.{col}, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
FROM probes p LEFT JOIN counters c USING (row_i, slot)
GROUP BY p.{col}
"""


# -- Mergeable histogram quantiles ---------------------------------------
#
# Same portability contract again: a fixed-bin histogram over an
# integer-valued column (work in the smallest integer unit — cents,
# micros, bytes — never floats). bin = (value - lo) >> bin_shift,
# clamped to [0, n_bins-1]; counts are exact BIGINTs; merge =
# elementwise SUM (map-side combinable, mergeable across partitions,
# tables, and days). Quantile q is read off the cumulative counts with
# integer-ceil rank targets, answering with the bin's EXCLUSIVE upper
# bound — every intermediate is an exact integer, so Spark and the
# DuckDB oracle agree bit-for-bit (unlike percentile_approx / t-digest,
# whose sketch bytes are engine-private). Max error = one bin width,
# chosen by the caller; n_bins BIGINTs of state regardless of input
# size, so daily histogram tables replace 100-TB re-scans for latency /
# size / price distribution questions.

def hist_counts(
    df: DataFrame, col: Column | str, lo: int, bin_shift: int, n_bins: int
) -> DataFrame:
    """(bin, cnt) histogram register table over an integer column.

    ``bin_shift`` makes the bin width a power of two so the bin id is a
    pure shift — exact in both engines, no float division anywhere."""
    c = F.col(col) if isinstance(col, str) else col
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.shiftright((c - lo).cast("long"), bin_shift)),
    )
    return (
        df.select(b.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*counts: DataFrame) -> DataFrame:
    """Merge histogram tables (days / partitions / tables): sum."""
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    counts: DataFrame, pcts: list[int], lo: int, bin_shift: int
) -> DataFrame:
    """(pct, n, est) per requested integer percentile.

    rank target = ceil(n·pct/100) as exact integer arithmetic; the
    estimate is the exclusive upper bound of the first bin whose
    cumulative count reaches the target. The window/cross-join here
    runs over the SKETCH (≤ n_bins rows), never the data."""
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "bin", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    spark = counts.sparkSession
    pct_df = spark.createDataFrame([(int(p),) for p in pcts], "pct int")
    target = F.floor((F.col("n") * F.col("pct") + 99) / 100).cast("long")
    return (
        cum.crossJoin(F.broadcast(pct_df))
        .where(F.col("cum") >= target)
        .groupBy("pct")
        .agg(
            F.max("n").alias("n"),
            (
                (F.min("bin").cast("long") + 1) * F.lit(1 << bin_shift)
                + F.lit(lo)
            ).alias("est"),
        )
        .orderBy("pct")
    )


def hist_sql(
    cents_expr: str, table: str, lo: int, bin_shift: int, n_bins: int,
    pcts: list[int],
) -> str:
    """DuckDB replay of hist_counts + hist_quantiles (oracle mirror)."""
    pct_list = ", ".join(str(int(p)) for p in pcts)
    return f"""
WITH v AS (SELECT CAST({cents_expr} AS BIGINT) AS c FROM {table}),
b AS (
  SELECT least({n_bins - 1}, greatest(0, (c - {lo}) >> {bin_shift})) AS bin
  FROM v
),
counts AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY bin),
cum AS (
  SELECT bin, cnt,
         CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM counts
),
pcts AS (SELECT unnest([{pct_list}]) AS pct)
SELECT p.pct, max(c.n) AS n,
       (CAST(min(c.bin) AS BIGINT) + 1) * {1 << bin_shift} + {lo} AS est
FROM cum c CROSS JOIN pcts p
WHERE c.cum >= (c.n * p.pct + 99) // 100
GROUP BY p.pct
ORDER BY p.pct
"""
