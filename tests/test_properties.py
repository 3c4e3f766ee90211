"""Property-based checks of the merge semantics against a python model.

hypothesis generates adversarial little change logs (key collisions,
version ties, deletes, ragged batch splits); the engine's final state
must equal a brute-force LWW simulation, for every dedup strategy and
any batch partitioning. Spark jobs are slow, so example counts are
small but the per-example space is nasty on purpose.
"""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from clinvar_ingest_spark.sources import ChangeLogSource
from clinvar_ingest_spark.sources.change_log import OffsetRange
from clinvar_ingest_spark.streaming import IngestPipeline
from clinvar_ingest_spark.tables import SnapshotTable

BASE = dt.datetime(2024, 1, 1)

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
    ]
)

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["u0", "u1", "u2"]),        # tiny key pool → collisions
        st.integers(min_value=0, max_value=3),      # coarse ts → ties
        st.sampled_from(["insert", "update", "delete"]),
    ),
    min_size=1,
    max_size=12,
)


def simulate(events):
    """Brute-force LWW: winner per url by (ts, seq); delete winner → absent."""
    best = {}
    for seq, (url, ts, op) in enumerate(events):
        key = (ts, seq)
        if url not in best or key > best[url][0]:
            best[url] = (key, op, seq)
    # engine stores EXTRACTED text (tags stripped by the Arrow UDF)
    return {
        url: (f"{url} v{seq}", seq)
        for url, (_, op, seq) in best.items()
        if op != "delete"
    }


def run_engine(spark, tmpdir, events, splits, strategy, merge_mode="cow"):
    rows = [
        (
            0,
            seq,
            op,
            url,
            BASE + dt.timedelta(hours=ts),
            None if op == "delete" else f"<p>{url} v{seq}</p>".encode(),
        )
        for seq, (url, ts, op) in enumerate(events)
    ]
    log = spark.createDataFrame(
        rows, "part int, seq long, op string, url string, warc_ts timestamp, html binary"
    )
    tbl = SnapshotTable(spark, tmpdir, "url", 4).create(PAGES)
    pipe = IngestPipeline(
        spark, ChangeLogSource(log), tbl,
        dedup_strategy=strategy, merge_mode=merge_mode,
    )
    lo = -1
    for hi in sorted({min(s, len(events) - 1) for s in splits} | {len(events) - 1}):
        if hi > lo:
            pipe.run_batch(OffsetRange(lo, hi), log_end_seq=len(events) - 1)
            lo = hi
    return {
        r["url"]: (r["text"], r["seq"]) for r in pipe.current_state().collect()
    }


@pytest.mark.parametrize(
    "strategy,merge_mode",
    [
        ("window", "cow"),
        ("salted_window", "cow"),
        ("max_by", "cow"),
        ("window", "mor"),
    ],
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=events_strategy,
    splits=st.sets(st.integers(min_value=0, max_value=11), max_size=3),
)
def test_engine_equals_simulation(
    spark, tmp_path_factory, events, splits, strategy, merge_mode
):
    tmpdir = str(tmp_path_factory.mktemp("prop"))
    got = run_engine(spark, tmpdir, events, splits, strategy, merge_mode)
    assert got == simulate(events)
