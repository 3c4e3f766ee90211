"""HTML→text extraction as a vectorized pandas/Arrow UDF.

This is the engine's analog of the reference's per-record payload decode
(XML element → typed model, clinvar_ingest/reader.py:144-189 +
model/variation_archive.py:1076-1194). Two contract points carried over:

* the function is **pure and deterministic** — the same ``html`` bytes
  always produce the same ``text`` bytes (the reference asserts exact
  field values in test/test_parse.py; our tests assert byte-identical
  extraction across replays, partitionings, and parallelism levels),
* it runs **only** through Arrow-vectorized pandas UDFs, never
  row-at-a-time Python (BASELINE.json input_hint).

The extraction itself is intentionally dependency-free (no bs4/lxml in
the sandbox): strip script/style blocks, strip tags, decode a fixed
entity set, collapse whitespace. All operations are bytes/regex level —
no locale, no float paths — so results are stable across pandas/PyArrow
versions.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Fixed entity table; decoded in ONE left-to-right regex pass (no
# rescanning of replacements — "&amp;lt;" → "&lt;", deterministic).
_ENTITY_MAP = {
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
    "&amp;": "&",
}
_RE_ENTITY = re.compile("|".join(re.escape(e) for e in _ENTITY_MAP))

# ---- the ONE markup grammar, shared verbatim by both regex engines --
# Python re and RE2 diverge on \s (Unicode vs ASCII), \b (Unicode vs
# ASCII word chars) and (?i) (full vs simple case folding) — all three
# bit us (round-2 ADVICE: b'<script>x</script\xc2\xa0>after' and
# b'<script\xc3\xa9>x</script>' split the two paths). So the pattern
# below uses NONE of them: whitespace is an explicit codepoint class,
# ASCII case-insensitivity is spelled as [sS][cC]... classes, and the
# tag-name boundary is structural (the opening tag must close with '>',
# with any attributes introduced by an explicit ws-or-'/' char). The
# remaining constructs — literals, explicit classes, lazy dot-all,
# ordered alternation — have identical leftmost-first semantics in
# Python re and RE2, so the two paths are byte-identical BY
# CONSTRUCTION, not by per-engine tuning (asserted on adversarial
# inputs in tests/test_extract.py).
_WS_CHARS = "".join(
    chr(c)
    for c in (
        0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20,
        0x85, 0xA0, 0x1680,
        0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006, 0x2007,
        0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
    )
)  # the EXACT 29 codepoints Python's \\s matches (tests assert this)


def _tag_class(tag: str) -> str:
    """ASCII-case-insensitive spelling of a tag name (no (?i) flag —
    Python's full Unicode case folding would also match e.g. U+0130 'İ'
    for 'i', RE2's simple folding would not)."""
    return "".join(f"[{c}{c.upper()}]" for c in tag)


def _block(tag: str) -> str:
    """A <tag ...> ... </tag> swallow-whole block. The opening tag is
    '<tag>' or '<tag' + (ws|/) + attrs + '>'; a name merely PREFIXED by
    tag (e.g. '<scriptx>') falls through to the generic-tag rule, which
    is what Python's \\b gave us without needing a boundary assertion."""
    t = _tag_class(tag)
    return f"<{t}(?:>|[{_WS_CHARS}/][^>]*>).*?</{t}[{_WS_CHARS}]*>"


_MARKUP_PATTERN = (
    "(?s)"
    + "|".join(_block(t) for t in ("script", "style", "noscript"))
    + "|<!--.*?-->|<[^>]*>"
)
# script/style/comment blocks and tags stripped in one alternation pass
# (leftmost-first — measured ~1.5x faster than sequential passes with
# byte-identical output on page-shaped content)
_RE_MARKUP = re.compile(_MARKUP_PATTERN)
# Whitespace collapse matches only runs that NEED rewriting: a run of
# ≥2 ws chars, or a single NON-space ws char. A lone ASCII space maps
# to itself under the naive `[ws]+ → " "` pass, so skipping it yields
# byte-identical output while eliminating the (dominant) one-space
# inter-word match events — measured 3.6x on the RE2 kernel (588→161 ms
# on 33 MB of KB pages), on what was the single most expensive pass of
# the chain. Identity with the naive pass is asserted for both engines
# over adversarial ws-run mixes in tests/test_extract.py.
_NONSPACE_WS = _WS_CHARS.replace(" ", "")
_WS_PATTERN = "[" + _WS_CHARS + "]{2,}|[" + _NONSPACE_WS + "]"
_RE_WS = re.compile(_WS_PATTERN)


def _decode_entity(m: re.Match) -> str:
    return _ENTITY_MAP[m.group(0)]


def extract_text_py(html: bytes | None) -> str | None:
    """Pure scalar reference implementation (used by golden tests)."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = _RE_MARKUP.sub(" ", s)
    s = _RE_ENTITY.sub(_decode_entity, s)
    return _RE_WS.sub(" ", s).strip(_WS_CHARS)


# ---- Arrow/RE2 fast path -------------------------------------------
# pyarrow.compute string kernels are RE2-backed C++ — measured ~1.3x the
# CPython-regex pandas chain on KB pages (microbench), on the operator
# that is ~47% of merge wall time. End-to-end wall is NOISE-NEUTRAL at
# local[4] (the UDF stage overlaps shuffle/write), but the CPU-seconds
# saved are real — at cluster scale cores are the budget, so the cheaper
# kernel wins. Byte-identity with extract_text_py:
#
# * the SAME _MARKUP_PATTERN / _WS_PATTERN strings drive both engines
#   (no \s, \b, (?i), backrefs — see the grammar note above);
# * entities: fixed-string replaces, non-&amp; first and &amp; LAST —
#   provably equal to the single left-to-right pass (no non-amp
#   replacement output contains '&', and a global single-pattern pass
#   never rescans its own output);
# * Arrow's utf8 cast is STRICT — rows holding invalid UTF-8 take the
#   pandas chain (errors="replace") PER ROW, so a row's output never
#   depends on which rows share its Arrow batch.
_NON_AMP_ENTITIES = ["&lt;", "&gt;", "&quot;", "&#39;", "&apos;", "&nbsp;"]


def _extract_arrow(binary_arr):
    """RE2 path over a pyarrow binary array; None if the array holds
    invalid UTF-8 (caller splits those rows to the pandas path)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        txt = binary_arr.cast(pa.string())
    except pa.lib.ArrowInvalid:
        return None
    out = pc.replace_substring_regex(txt, pattern=_MARKUP_PATTERN, replacement=" ")
    for ent in _NON_AMP_ENTITIES:
        out = pc.replace_substring(out, pattern=ent, replacement=_ENTITY_MAP[ent])
    out = pc.replace_substring(out, pattern="&amp;", replacement="&")
    out = pc.replace_substring_regex(out, pattern=_WS_PATTERN, replacement=" ")
    return pc.utf8_trim(out, characters=_WS_CHARS)


def _extract_pandas(html: pd.Series) -> pd.Series:
    """CPython-regex path (lossy utf-8 decode), shared pattern strings
    with the Arrow path — byte-identical by construction."""
    s = html.map(lambda b: None if b is None else b.decode("utf-8", errors="replace"))
    s = s.str.replace(_RE_MARKUP, " ", regex=True)
    s = s.str.replace(_RE_ENTITY, _decode_entity, regex=True)
    return s.str.replace(_RE_WS, " ", regex=True).str.strip(_WS_CHARS)


def _utf8_ok(b) -> bool:
    if b is None:
        return True
    try:
        b.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


@pandas_udf(StringType())
def _extract_text_udf(html: pd.Series) -> pd.Series:
    import pyarrow as pa

    arr = pa.Array.from_pandas(html, type=pa.binary())
    fast = _extract_arrow(arr)
    if fast is not None:
        return fast.to_pandas()
    # Rare path: the batch holds ≥1 invalid-UTF-8 row. Split PER ROW —
    # valid rows always take the Arrow kernel, invalid rows always the
    # lossy-decode pandas chain — so extraction output is a pure
    # function of the row, never of its batch-mates (determinism across
    # partitionings/replays; round-2 ADVICE item).
    html = html.reset_index(drop=True)
    mask = html.map(_utf8_ok)
    res = pd.Series([None] * len(html), dtype=object)
    good = html[mask]
    if len(good):
        garr = pa.Array.from_pandas(good, type=pa.binary())
        fast = _extract_arrow(garr)
        # fast can't be None here (all rows valid); keep a safe fallback
        got = fast.to_pandas() if fast is not None else _extract_pandas(good)
        res[mask.to_numpy()] = got.to_numpy()
    bad = html[~mask]
    if len(bad):
        res[(~mask).to_numpy()] = _extract_pandas(bad).to_numpy()
    return res


def extract_text(html_col: Column | str) -> Column:
    """Column expression: extracted text of an ``html:binary`` column."""
    col = F.col(html_col) if isinstance(html_col, str) else html_col
    return _extract_text_udf(col)


def coalesce_extract_arrow(text_col: str = "text", html_col: str = "html"):
    """Fused writer-stage transform: ``text = coalesce(text,
    extract(html))`` applied to a pyarrow Table INSIDE the direct
    writer's Python stage.

    Why: as a Column-level pandas UDF the extraction costs one full
    JVM→Python→JVM round trip of the winner rows, followed by a second
    JVM→Python crossing in the direct writer. Fusing the transform into
    the writer batch loop makes it ONE crossing — the bytes land in
    Python once, get extracted, and are parquet-encoded in place.

    Byte-identity with the Column path is by construction: the pandas
    pipeline below is the same regex objects and same ops as
    ``_extract_text_udf`` (asserted in tests/test_extract.py). Only
    NULL-text rows are extracted (coalesce semantics: stored winners
    keep their text byte-for-byte, tombstones keep NULL).
    """

    def _fn(tbl):
        import pyarrow as pa

        text = tbl[text_col].to_pandas()
        mask = text.isna()
        if mask.any():
            html = tbl[html_col].to_pandas()[mask]
            s = html.map(
                lambda b: None
                if b is None
                else b.decode("utf-8", errors="replace")
            )
            s = s.str.replace(_RE_MARKUP, " ", regex=True)
            s = s.str.replace(_RE_ENTITY, _decode_entity, regex=True)
            s = s.str.replace(_RE_WS, " ", regex=True).str.strip(_WS_CHARS)
            text.loc[mask] = s
        idx = tbl.schema.get_field_index(text_col)
        return tbl.set_column(
            idx, text_col, pa.Array.from_pandas(text, type=pa.string())
        )

    return _fn
