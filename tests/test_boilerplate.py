"""Corpus-level boilerplate-line removal (curation.py
remove_boilerplate_lines): lines above the document-frequency
threshold vanish from every doc, unique lines survive in order,
blank lines are structure."""

from clinvar_ingest_spark.operators.curation import remove_boilerplate_lines

DOCS = [
    (1, "NAV HOME\nunique one\n\nNAV HOME repeated inside\nFOOTER"),
    (2, "NAV HOME\nunique two\nFOOTER"),
    (3, "NAV HOME\nunique three\nFOOTER"),
    (4, "all original\nlines here"),
    (5, ""),
]


def _run(spark, max_line_df=2, docs=DOCS):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(
            df, max_line_df=max_line_df
        ).collect()
    }


def test_boilerplate_lines_removed_everywhere(spark):
    out = _run(spark)
    # NAV HOME (df=3) and FOOTER (df=3) exceed max_line_df=2 -> dropped
    # from ALL docs; 'NAV HOME repeated inside' is a different line
    assert out[1] == "unique one\n\nNAV HOME repeated inside"
    assert out[2] == "unique two"
    assert out[3] == "unique three"
    assert out[4] == "all original\nlines here"


def test_line_counts(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {
        r["doc_id"]: (r["n_lines"], r["n_kept"])
        for r in remove_boilerplate_lines(df, max_line_df=2).collect()
    }
    # doc 1: 5 lines, keeps unique+blank+inside-repeat = 3
    assert rows[1] == (5, 3)
    assert rows[2] == (3, 1)
    # doc 5 is a single blank line; blank is structure -> kept
    assert rows[5] == (1, 1)


def test_blank_lines_never_counted_or_removed(spark):
    # blank line appears in many docs; still kept as structure
    docs = [(i, "a%d\n\nb%d" % (i, i)) for i in range(5)]
    out = _run(spark, max_line_df=1, docs=docs)
    assert out[0] == "a0\n\nb0"


def test_all_docs_survive_even_if_emptied(spark):
    docs = [(1, "SAME"), (2, "SAME"), (3, "SAME"), (4, "keep me")]
    out = _run(spark, max_line_df=2, docs=docs)
    assert out == {1: "", 2: "", 3: "", 4: "keep me"}


def test_duplicate_line_within_one_doc_counts_once(spark):
    # 'X' df=2 (docs 1,2) even though doc 1 has it twice -> kept at
    # threshold 2
    docs = [(1, "X\nmid\nX"), (2, "X"), (3, "solo")]
    out = _run(spark, max_line_df=2, docs=docs)
    assert out[1] == "X\nmid\nX"
