"""Streaming exact dedup: drop repeated content at ingest time.

A web change log is full of byte-identical re-crawls (mirrors, URL
aliases, unchanged pages re-fetched). Deduplicating at INGEST — before
the merge, before storage — is the cheapest place to do it: the copy
never costs a write. The batch-side exact dedup
(operators/dedup.py) covers stored corpora; this is the
always-on tail (reference analog: the reference gates per-release
copies once, clinvar_ingest/workflow.py — here the gate key is the
content fingerprint and the stream never ends).

Spark-first: the operator is ``dropDuplicatesWithinWatermark`` — the
engine's own stateful dedup with watermark-driven state GC — over an
``md5`` content fingerprint, NOT a custom StatefulProcessor. State
per distinct fingerprint is one row bounded by the watermark horizon;
nothing is collected, nothing is broadcast.

Semantics: the FIRST event carrying a fingerprint passes; later
copies arriving while the fingerprint is inside the watermark window
are dropped. A copy arriving later than the watermark delay after the
kept event may pass again (state was GC'd) — that is the documented
trade of bounded state, same as every watermarked operator. "First"
is processing order: deterministic when batch membership and in-batch
order are pinned (see the stream_exact_dedup query gate), and at
production scale the policy is "keep one copy", where which copy wins
is immaterial because the fingerprint covers the payload columns.

The fingerprint is 128-bit (md5 over the unit-separator-joined
columns), not a 64-bit hash: at 10^10 events birthday math on 64
bits expects a handful of collisions — each one a DISTINCT page
silently dropped — while 128 bits puts the expectation below 10^-18.
Fingerprint equality is still hash equality, not byte equality; a
caller needing absolute certainty should key on the raw columns and
pay the state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    events: DataFrame,
    fingerprint_cols: tuple[str, ...] = ("text",),
    ts_col: str = "warc_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-wins exact dedup over a streaming DataFrame.

    ``fingerprint_cols`` are md5-hashed (128-bit, JVM-side codegen)
    into one state key; NULL and empty-string column values hash
    differently (each column rides as length-prefixed bytes). The
    watermark on ``ts_col`` bounds both late-data acceptance and
    dedup-state lifetime. Output schema = input schema (the
    fingerprint column is internal, its name chosen to never collide
    with an input column).

    Scale: state is one compact row per distinct fingerprint inside
    the watermark horizon, hash-partitioned by fingerprint across
    executors — no skew (fingerprints of distinct content are
    uniform), no driver state. For an unbounded horizon use the
    batch-side exact dedup on the stored table instead; unbounded
    streaming state is the anti-pattern this watermark exists to
    prevent."""
    fp_name = "_fp"
    while fp_name in events.columns:
        fp_name = "_" + fp_name
    parts: list = []
    for c in fingerprint_cols:
        s = F.col(c).cast("string")
        # length prefix + null marker: ("ab","c") never equals
        # ("a","bc"), and NULL never equals ""
        parts.append(
            F.when(s.isNull(), F.lit("\x00")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    fp = F.md5(F.concat_ws("\x1f", *parts).cast("binary"))
    return (
        events.withColumn(fp_name, fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([fp_name])
        .drop(fp_name)
    )
