"""Ordered change-log source: offset-range batching over any DataFrame.

Reference analog: the Kafka FTP-watcher topic replayed from offset 0
(misc/re-run/read-topic.py:37-81) and the "ready work" queries over
processing_history (processing_history.py:596-696). The engine's unit
of work is a half-open global offset range ``(lo, hi]``; within a range
the per-source-partition sub-ranges are recorded for lineage.

In production this source is a Kafka/Iceberg-changelog stream; in the
sandbox it is any DataFrame with (part, seq, ...) columns. The filter
``seq > lo AND seq <= hi`` is a plain Catalyst predicate, so against a
parquet/Iceberg-backed log it push-downs to the scan and prunes files
by seq min/max — tailing is O(new data), not O(log).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class OffsetRange:
    lo: int  # exclusive
    hi: int  # inclusive


class ChangeLogSource:
    def __init__(self, log: DataFrame, seq_col: str = "seq", part_col: str = "part"):
        self.log = log
        self.seq_col = seq_col
        self.part_col = part_col

    def max_seq(self) -> int:
        row = self.log.agg(F.max(self.seq_col).alias("m")).collect()[0]
        return -1 if row["m"] is None else int(row["m"])

    def batch(self, rng: OffsetRange) -> DataFrame:
        c = F.col(self.seq_col)
        return self.log.filter((c > F.lit(rng.lo)) & (c <= F.lit(rng.hi)))

    def plan_batches(self, lo: int, hi: int, span: int) -> list[OffsetRange]:
        """Deterministic replay plan: fixed-span ranges covering (lo, hi]."""
        out = []
        cur = lo
        while cur < hi:
            nxt = min(cur + span, hi)
            out.append(OffsetRange(cur, nxt))
            cur = nxt
        return out

    def part_ranges(self, batch: DataFrame) -> list[dict]:
        """Per-source-partition (lo, hi, n) of a batch — the lineage rows."""
        rows = (
            batch.groupBy(self.part_col)
            .agg(
                F.min(self.seq_col).alias("seq_lo"),
                F.max(self.seq_col).alias("seq_hi"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .collect()
        )
        return [
            {
                "part": int(r[self.part_col]),
                "seq_lo": int(r["seq_lo"]),
                "seq_hi": int(r["seq_hi"]),
                "n_rows": int(r["n_rows"]),
            }
            for r in rows
        ]
