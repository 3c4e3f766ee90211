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
``xxhash64`` content fingerprint, NOT a custom StatefulProcessor.
State per distinct fingerprint is one row bounded by the watermark
horizon; nothing is collected, nothing is broadcast.

Semantics: the FIRST event carrying a fingerprint passes; later
copies arriving while the fingerprint is inside the watermark window
are dropped. A copy arriving later than the watermark delay after the
kept event may pass again (state was GC'd) — that is the documented
trade of bounded state, same as every watermarked operator. "First"
is processing order: deterministic when batch membership and in-batch
order are pinned (see the stream_exact_dedup query gate), and at
production scale the policy is "keep one copy", where which copy wins
is immaterial because the payloads are identical — the fingerprint
INCLUDES the payload.
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

    ``fingerprint_cols`` are hashed (xxhash64, JVM-side codegen) into
    one state key; the watermark on ``ts_col`` bounds both late-data
    acceptance and dedup-state lifetime. Output schema = input schema
    (the fingerprint is internal).

    Scale: state is one compact row per distinct fingerprint inside
    the watermark horizon, hash-partitioned by fingerprint across
    executors — no skew (fingerprints of distinct content are
    uniform), no driver state. For an unbounded horizon use the
    batch-side exact dedup on the stored table instead; unbounded
    streaming state is the anti-pattern this watermark exists to
    prevent."""
    fp = F.xxhash64(*[F.col(c) for c in fingerprint_cols])
    return (
        events.withColumn("_fp", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
