"""clinvar_ingest_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
``clingen-data-model/clinvar-ingest`` (see /root/repo/SURVEY.md):

* an ordered change log of page events (insert/update/delete keyed by
  ``url``, versioned by ``warc_ts``) is tailed in offset-range batches
  (reference analog: Kafka FTP-watcher topic, ``misc/re-run/read-topic.py``),
* last-writer-wins dedup is a salted two-phase window-rank
  (reference analog: ``cloud/bigquery/create_tables.py:176-222``),
* HTML→text extraction runs only through vectorized pandas/Arrow UDFs,
* batches are applied to snapshot-isolated lake tables via key-bucketed
  MERGE upserts with tombstone deletes, additive schema evolution,
  exactly-once commit fencing on a checkpointed high-water-mark, and
  per-partition lineage + throughput metrics
  (reference analog: ``processing_history.py``).

Everything is expressed with the DataFrame API so Catalyst plans the
physical execution; Python appears only in Arrow-vectorized UDFs.
"""

__version__ = "0.1.0"

from clinvar_ingest_spark.session import get_spark  # noqa: F401
