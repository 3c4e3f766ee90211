"""Extraction UDF: byte-identical, golden values, Arrow-vectorized only.

Reference analog: field-exact golden asserts in test/test_parse.py
(incl. HTML-entity unescape, test_parse.py:774-780).
"""

from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.extract import extract_text, extract_text_py

GOLDEN = [
    (b"<html><body><p>Hello</p></body></html>", "Hello"),
    (b"<p>a &amp; b &lt;c&gt;</p>", "a & b <c>"),
    (b"<script>var x=1;</script><b>keep</b><style>.a{}</style>", "keep"),
    (b"<!-- gone --><div>  lots   of\n whitespace </div>", "lots of whitespace"),
    (b"", ""),
    (None, None),
    ("caf\xe9 <i>über</i>".encode(), "caf\xe9 über"),
    (b"\xff\xfebad utf8<x>", "��bad utf8"),
]


def test_scalar_golden():
    for html, want in GOLDEN:
        assert extract_text_py(html) == want, html


def test_vectorized_matches_scalar(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(GOLDEN)], "i int, html binary"
    )
    got = {r["i"]: r["t"] for r in
           df.select("i", extract_text("html").alias("t")).collect()}
    assert got == {i: w for i, (_, w) in enumerate(GOLDEN)}


def test_plan_is_arrow_vectorized(spark):
    """The extraction must appear as ArrowEvalPython, never BatchEvalPython
    (row-at-a-time) — the input_hint's 'no per-row Python' rule."""
    df = spark.createDataFrame([(b"<p>x</p>",)], "html binary")
    plan = (
        df.select(extract_text("html"))._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
