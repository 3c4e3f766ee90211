"""Normalization fan-out: derive entity tables from one state scan.

Reference parity: the disassemble step explodes one parsed record into
~18 normalized entity streams, each written to its own table
(clinvar_ingest/model/variation_archive.py:1196-1225 +
parse.py:232-252). The engine's analog derives secondary entity tables
from the pages state — domain rollups, a slim url index, language
stats — all from ONE scan (persist the source, fan out writes), the
multi-table-from-one-scan pattern.

These are materialized views over the LWW state, in two refresh modes:

* full (plain callable): rewritten from a full state scan — fine for
  small tables, the bootstrap path;
* incremental (:class:`IncrementalDerivation`): the scale path. The
  derived aggregate is maintained as PER-SOURCE-BUCKET partial
  aggregates (all the derivations below are algebraic: count/sum/max
  combine), stored partitioned by source bucket. After a batch, only
  the buckets whose manifest file lists changed since the last refresh
  are re-aggregated — delta-sized work per batch instead of a full
  state scan — and the serving read folds the (tiny:
  n_buckets × n_groups) partials with the ``final`` combine. At 10^10
  rows per batch cost is O(touched buckets), the read-side fold is
  O(n_buckets × n_domains) — metadata-scale.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SRC_BUCKET = "_src_bucket"


@dataclass(frozen=True)
class IncrementalDerivation:
    """Partial-aggregate spec for incrementally-maintained derived tables.

    ``partial(slice)``: slice of the pages state carrying ``_src_bucket``
    → partial rows, which MUST keep ``_src_bucket`` (group by it).
    ``final(partials)``: union of all buckets' partials → serving rows.
    For map-only derivations (projections) ``final`` just drops the
    bucket column — the partials ARE the rows.
    """

    partial: Callable[[DataFrame], DataFrame]
    final: Callable[[DataFrame], DataFrame]

DOMAIN_RE = r"^https?://([^/]+)"


def domain_of(url_col) -> F.Column:
    return F.regexp_extract(url_col, DOMAIN_RE, 1)


def derive_domain_stats(pages: DataFrame) -> DataFrame:
    """Per-domain rollup of the current page state."""
    return (
        pages.groupBy(domain_of(F.col("url")).alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("text")).alias("total_text_chars"),
            F.max("warc_ts").alias("last_crawled"),
            F.max("seq").alias("max_seq"),
        )
    )


def derive_url_index(pages: DataFrame) -> DataFrame:
    """Slim lookup entity: url → (domain, version) without payloads —
    the FK-style link table of the disassemble graph."""
    return pages.select(
        "url",
        domain_of(F.col("url")).alias("domain"),
        "warc_ts",
        "seq",
    )


domain_stats_incremental = IncrementalDerivation(
    partial=lambda df: (
        df.groupBy(SRC_BUCKET, domain_of(F.col("url")).alias("domain")).agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("text")).alias("total_text_chars"),
            F.max("warc_ts").alias("last_crawled"),
            F.max("seq").alias("max_seq"),
        )
    ),
    final=lambda p: (
        p.groupBy("domain").agg(
            F.sum("n_pages").alias("n_pages"),
            F.sum("total_text_chars").alias("total_text_chars"),
            F.max("last_crawled").alias("last_crawled"),
            F.max("max_seq").alias("max_seq"),
        )
    ),
)

url_index_incremental = IncrementalDerivation(
    # map-only: the per-bucket rows ARE the index; refresh replaces
    # exactly the touched buckets' partitions
    partial=lambda df: df.select(
        SRC_BUCKET, "url", domain_of(F.col("url")).alias("domain"),
        "warc_ts", "seq",
    ),
    final=lambda p: p.drop(SRC_BUCKET),
)


def derive_entities(pages: DataFrame) -> dict[str, DataFrame]:
    """All derived entity tables from ONE scan: persist the source so
    the fan-out reads it once (parse.py routes each record to N files
    from one pass; here N plans share one cached scan)."""
    src = pages.persist()
    out = {
        "domain_stats": derive_domain_stats(src),
        "url_index": derive_url_index(src),
    }
    return out
