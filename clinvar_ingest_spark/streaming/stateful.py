"""Custom stateful streaming operator: per-key LWW version tracker.

``applyInPandasWithState`` keeps one (warc_ts, seq, op) record per url
in the state store and emits a row whenever a batch CHANGES a key's
winner — i.e. a streaming change-feed of the LWW state, arbitrary
stateful logic the built-in aggregations can't express (the emitted
row depends on the state transition, not just the aggregate value).

This complements the two other streaming modes:
* foreachBatch → snapshot-table merge (structured.py) — the sink path,
* watermarked window aggs (windows.py) — bounded-state rollups,
* applyInPandasWithState (here) — custom per-key state machines.

State is Arrow-batched per group; timeouts are not used (the change
log is replayable; state GC would key off a watermark in prod).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("transition", T.StringType()),  # created|updated|deleted
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("warc_ts_us", T.LongType()),  # epoch micros (state-store safe)
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
    ]
)


def _track(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    url = key[0]
    if state.exists:
        ts_us, seq, op = state.get
    else:
        ts_us, seq, op = -1, -1, None

    # Vectorized per-batch argmax: the LWW winner is the lexicographic
    # max of (warc_ts, seq). Sorting the (small, per-key) pandas frame
    # once and taking the last row stays columnar — no per-row Python.
    best_ts, best_seq, best_op = ts_us, seq, op
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        top = pdf.sort_values(["warc_ts", "seq"], kind="stable").iloc[-1]
        r_ts = int(top["warc_ts"].value // 1000)  # ns → µs
        if (r_ts, int(top["seq"])) > (best_ts, best_seq):
            best_ts, best_seq, best_op = r_ts, int(top["seq"]), top["op"]

    if (best_ts, best_seq) == (ts_us, seq):
        return  # batch contained only stale versions — no transition
    state.update((best_ts, best_seq, best_op))

    if best_op == "delete":
        transition = "deleted"
    elif op is None or op == "delete":
        transition = "created"
    else:
        transition = "updated"
    yield pd.DataFrame(
        {
            "url": [url],
            "warc_ts": [pd.Timestamp(best_ts, unit="us")],
            "seq": [best_seq],
            "op": [best_op],
            "transition": [transition],
        }
    )


def lww_change_feed(stream: DataFrame) -> DataFrame:
    """Streaming change-feed: one row per (key, micro-batch) whose LWW
    winner changed. Input needs (url, warc_ts, seq, op) columns."""
    return (
        stream.select("url", "warc_ts", "seq", "op")
        .groupBy("url")
        .applyInPandasWithState(
            _track,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
