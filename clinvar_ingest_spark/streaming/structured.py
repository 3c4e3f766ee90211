"""Structured Streaming front-end for the ingest pipeline.

Production shape: ``readStream`` over the change-log location (file
source here; Kafka source in prod — same DataFrame contract) →
``foreachBatch`` applying the same LWW merge as the batch pipeline →
Spark's checkpointLocation provides the replay-on-crash offsets, while
the SnapshotTable's own HWM fencing makes the re-delivered micro-batch
idempotent — the standard exactly-once-sink recipe (at-least-once
delivery + idempotent apply).

The batch pipeline (pipeline.py) stays the deterministic-replay path
(offset ranges chosen by us, byte-reproducible state); this module is
the always-on tail. Both converge to identical final state because the
merge is order-insensitive across batch boundaries (LWW + stored
tombstones), which tests/test_streaming.py asserts.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinvar_ingest_spark.streaming.pipeline import IngestPipeline
from clinvar_ingest_spark.tables import SnapshotTable


class StreamingIngest:
    def __init__(
        self,
        spark: SparkSession,
        target: SnapshotTable,
        checkpoint_dir: str,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        dedup_strategy: str = "window",
    ):
        self.spark = spark
        self.target = target
        self.checkpoint_dir = checkpoint_dir
        self.transform = transform or IngestPipeline.default_transform
        self.dedup_strategy = dedup_strategy
        self._run_token: str | None = None

    def _apply_batch(self, batch_df: DataFrame, epoch_id: int):
        if batch_df.isEmpty():
            return
        # Epoch fencing is scoped to THIS run: epoch_id is only monotonic
        # within one streaming run, and a restart against a new/deleted
        # checkpointLocation resets it to 0 — a table-lifetime fence
        # would then silently skip every re-delivered micro-batch until
        # epoch_id caught up (data loss). So the fence key is
        # (run_token, epoch_id): same-run duplicate applies (crash
        # between sink write and checkpoint advance) are skipped fast;
        # cross-run re-deliveries fall through to the merge, whose LWW
        # over {stored ∪ batch} makes the re-apply a no-op — exactly-once
        # via idempotent apply, the standard foreachBatch recipe.
        props = self.target.properties()
        if (
            props.get("stream_run") == self._run_token
            and int(props.get("stream_epoch", -1)) >= epoch_id
        ):
            return
        self.target.merge_upsert(
            batch_df.drop("part"),
            order_cols=("warc_ts", "seq"),
            op_col="op",
            properties={"stream_epoch": epoch_id, "stream_run": self._run_token},
            dedup_strategy=self.dedup_strategy,
            post_merge_transform=self.transform,
        )

    def run_available_now(self, source_dir: str, schema) -> None:
        """Drain everything currently in the log directory, then stop
        (Trigger.AvailableNow) — the streaming analog of run_to_end."""
        import uuid

        self._run_token = uuid.uuid4().hex
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 16)
            .parquet(source_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
