"""Text-analysis column expressions for training-data pipelines.

All JVM-side (no Python UDFs): language-ID by stopword voting, quality
scoring, token counting, document fingerprinting. Each builder returns a
pyspark Column; the constants below are shared with the DuckDB oracle
SQL generators in ``__spark_entry__`` so both engines express the exact
same deterministic rule.

Reference parity: these generalize the reference's scalar sanitizers
(sanitize_date/int_or_none, clinvar_ingest/model/common.py:100-127) to
the web-text payload.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fixed stopword sets (ordered dict: the CASE ladder priority)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "et", "les", "des", "une"],
}
# literal CJK range chars: parse identically in Java regex and RE2
CJK_PATTERN = f"[{chr(0x4E00)}-{chr(0x9FFF)}]"
TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"  # BPE-ish: words / numbers / marks
PUNCT_PATTERN = r"[.,!?;:]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single marks."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0))


def _stopword_hits(text: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(ws_tokens(F.lower(text)), lambda t: F.array_contains(words, t)))


def lang_id(text: Column) -> Column:
    """Deterministic n-gram/stopword language vote.

    CJK chars short-circuit to 'zh'; otherwise the language with the
    most stopword hits wins, ties broken by the fixed ladder order
    en > de > es > fr; zero hits everywhere → 'unknown'. The DuckDB
    oracle replays the identical ladder.
    """
    hits = {lang: _stopword_hits(text, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.when(F.lower(text).rlike(CJK_PATTERN), F.lit("zh"))
    for lang in STOPWORDS:  # ladder order = dict order
        expr = expr.when((hits[lang] == best) & (best > 0), F.lit(lang))
    return expr.otherwise(F.lit("unknown"))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic:
    0.4·min(tokens/100, 1) + 0.4·stopword_ratio + 0.2·(1 − punct_ratio)."""
    n_tok = token_count(text).cast("double")
    n_chars = F.length(text).cast("double")
    sw = _stopword_hits(text, "en").cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(text, PUNCT_PATTERN, ""))
    ).cast("double")
    stop_ratio = F.when(n_tok > 0, sw / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    return F.round(
        0.4 * F.least(n_tok / 100.0, F.lit(1.0))
        + 0.4 * stop_ratio
        + 0.2 * (1.0 - punct_ratio),
        4,
    )


# Gopher-style repetition gate thresholds (shared with the DuckDB
# oracle). Chosen from the corpus distribution: dup-2gram median ~0.03
# (p90 ~0.065), top-word ~0.10 — the gate drops the repetitive tail,
# not everything.
DUP_2GRAM_MAX = 0.04
TOP_WORD_MAX = 0.10


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word ``n``-grams over whitespace tokens.

    Pure codegen (split/sequence/transform/slice) — no shuffle, no
    Python. Documents shorter than ``n`` words yield an empty array
    (``F.sequence`` with start>stop would count DOWN, so the guard is
    load-bearing)."""
    if n == 1:
        return ws_tokens(text)
    w = ws_tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    )
    return F.when(F.size(w) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(text: Column) -> Column:
    """Gopher-style repetition signals as one struct column.

    Generalizes the repetition filters of Rae et al. 2021 ("Scaling
    Language Models: ... Gopher", Table A1) to this engine's documents:

    - ``n_words`` / ``n_distinct_words`` — duplicate-word mass,
    - ``n_2grams`` / ``n_distinct_2grams`` — duplicate-2gram mass
      (the "fraction of duplicate n-grams" family),
    - ``top_word_count`` — occurrences of the most frequent word (the
      "fraction of characters in most common word" family).

    Everything is an exact integer computed WITHOUT exploding: distinct
    counts via ``array_distinct`` and the mode via a
    transform-over-distinct count, so the whole thing is one codegen
    projection with zero shuffles — at 100 TB this runs at scan speed.
    Ratios are left to the caller (exact-int division is
    bit-deterministic in IEEE doubles, so both engines round alike).
    """
    w = ws_tokens(text)
    g = word_ngrams(text, 2)
    top = F.array_max(
        F.transform(
            F.array_distinct(w),
            lambda d: F.size(F.filter(w, lambda x: x == d)),
        )
    )
    return F.struct(
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct_words"),
        F.size(g).alias("n_2grams"),
        F.size(F.array_distinct(g)).alias("n_distinct_2grams"),
        F.coalesce(top, F.lit(0)).alias("top_word_count"),
    )


def nfc_normalize(text: Column) -> Column:
    """Unicode NFC normalization (the canonical pre-dedup step for web
    text: 'e'+COMBINING ACUTE and precomposed 'é' must fingerprint
    identically or near-dup misses them).

    Spark has no built-in normalizer, so this is the documented
    Arrow-batched exception to the builtins-first rule: a pandas UDF
    (vectorized transfer, ArrowEvalPython — NOT per-row
    BatchEvalPython) over ``unicodedata.normalize``, the same tables
    DuckDB's ``nfc_normalize`` implements, so the oracle is exact."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _nfc(s):
        import unicodedata

        return s.map(
            lambda x: None if x is None else unicodedata.normalize("NFC", x)
        )

    return _nfc(text)


def fingerprint(text: Column) -> Column:
    """Stable content fingerprint: md5 of case/space-normalized text
    (rolling-hash analog that both engines compute identically)."""
    return F.md5(F.lower(F.trim(text)))


# URL canonicalization rules, in application order. Deliberately
# regex-only (no urllib in the hot path — stays inside codegen) and
# deterministic; the DuckDB oracle applies the same regexes.
# The param NAME is anchored to a query separator and replaced with
# that separator (ADVICE r3: unanchored, 'href='/'subref='/'pref=' were
# mangled and 'name=value' text inside the path could be eaten —
# distinct URLs then collapsed to one canonical key). Separator runs
# left behind by removed params are collapsed by the later rules.
TRACKING_PARAM_RE = r"([?&])(utm_[a-z]+|gclid|fbclid|msclkid|ref)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonicalize a web URL for key-level dedup:

    1. lowercase scheme and host (path/query stay case-sensitive),
    2. strip the fragment,
    3. drop known tracking params (utm_*, gclid, fbclid, msclkid, ref),
    4. collapse leftover ``?&``/``&&``/trailing ``?``/``&``,
    5. drop default ports (:80 http, :443 https),
    6. strip a trailing slash on non-root paths.

    The same page crawled via campaign links, fragments, or mixed-case
    hosts then shares one canonical key — at 10^10 pages this is THE
    dedup lever before any content hashing."""
    u = F.regexp_replace(url, r"#.*$", "")                      # 2
    u = F.regexp_replace(u, TRACKING_PARAM_RE, "$1")            # 3
    u = F.regexp_replace(u, r"\?&+", "?")                       # 4
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    # 1: lowercase scheme://host[:port] prefix only
    pre = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.concat(pre, rest)
    # 5 — no lookahead (the oracle's RE2 lacks it): capture the
    # boundary char (or end) and put it back
    u = F.regexp_replace(u, r"^(https://[^/:?#]*):443([/?]|$)", "$1$2")
    u = F.regexp_replace(u, r"^(http://[^/:?#]*):80([/?]|$)", "$1$2")
    # 6 — non-root trailing slash RUN, at end of url or end of path
    # (the whole run, so the rule is idempotent on degenerate '//' tails)
    u = F.regexp_replace(u, r"(://[^/?#]+/.+?)/+\?", "$1?")
    return F.regexp_replace(u, r"(://[^/?#]+/.+?)/+$", "$1")


# ---------------------------------------------------------------- PII
# Redaction patterns, applied in order. RE2-safe (no lookaround, no
# backreferences) so Spark's Java regex and the DuckDB oracle's RE2
# match byte-identically; greedy quantifiers only, with no ambiguous
# alternation, so leftmost-first semantics agree across both engines.
# IP runs BEFORE phone so dotted triples prefer the more specific rule;
# email runs first because its local part may contain digits that the
# phone pattern would otherwise nibble.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"


def pii_counts(text: Column) -> Column:
    """Exact per-kind PII hit counts (pre-redaction) as one struct —
    the audit signal a redaction pass must emit so downstream can gate
    on residual-PII == 0. Pure codegen: regexp_extract_all sizes."""
    return F.struct(
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4_RE), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RE), 0)).alias("n_phones"),
    )


def pii_redact(text: Column) -> Column:
    """Redact emails → <EMAIL>, IPv4s → <IP>, phone-shaped numbers →
    <PHONE>, all occurrences, fixed rule order. This is the standard
    pre-training scrub (e.g. BigCode/StarCoder PII pipeline shape) as a
    single codegen projection — at 100 TB it runs at scan speed with no
    shuffle and no Python. Reference analog: the scalar sanitizer family
    (clinvar_ingest/model/common.py:100-127) applied to web text."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


# ------------------------------------------------------------ outlinks
# href extraction: double-quoted absolute http(s) URLs only — the
# deterministic common case both engines extract identically. Capture
# group 1 is the URL body.
HREF_RE = r'href="(https?://[^"]+)"'


def extract_outlinks(html_text: Column) -> Column:
    """All absolute http(s) outlinks of an HTML page, in document order.

    This is the edge-list feed for the link graph
    (operators/graph.py): pages → explode(outlinks) → (src_host,
    dst_host) edges → degrees/PageRank. Codegen regexp_extract_all —
    no Python, no shuffle until the caller aggregates."""
    return F.regexp_extract_all(html_text, F.lit(HREF_RE), 1)


def url_host(url: Column) -> Column:
    """Lowercased host[:port] of an absolute URL ('' if unparseable)."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))


# Gopher quality-gate constants (Rae et al. 2021, Appendix A): word
# count in [GOPHER_MIN_WORDS, GOPHER_MAX_WORDS], mean word length in
# [3, 10], hash/ellipsis symbol-word ratio <= 0.1, bullet-started lines
# <= 90%, ellipsis-ended lines <= 30%, words-with-an-alphabetic-char
# >= 80%, and at least 2 hits from an 8-word stop list. Shared with the
# DuckDB oracle; every comparison below is integer cross-multiplied so
# the keep verdict is bit-exact across engines.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_gates(text: Column) -> Column:
    """The Gopher document-quality gates as ONE codegen projection —
    struct of exact-integer evidence columns plus the composite
    ``keep``: no explode, no shuffle, runs at scan parallelism. Lines
    are split on newline; bullet/ellipsis rules count trimmed non-empty
    lines only (a doc with no lines passes those rules vacuously, which
    the integer inequalities encode for free: 0 <= 0)."""
    words = F.filter(
        F.split(F.trim(text), r"\s+"), lambda x: x != F.lit("")
    )
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    stops = F.array(*[F.lit(w) for w in GOPHER_STOPS])
    n_words = F.size(words).cast("long")
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_alpha = F.size(
        F.filter(words, lambda x: x.rlike("[a-zA-Z]"))
    ).cast("long")
    n_sym = F.size(
        F.filter(
            words,
            lambda x: x.contains("#") | x.contains("...") | x.contains("…"),
        )
    ).cast("long")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("-") | l.startswith("*") | l.startswith("•"),
        )
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(
            lines, lambda l: l.endswith("...") | l.endswith("…")
        )
    ).cast("long")
    n_stop = F.size(
        F.filter(words, lambda x: F.array_contains(stops, F.lower(x)))
    ).cast("long")
    keep = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (3 * n_words <= total_chars)
        & (total_chars <= 10 * n_words)
        & (10 * n_sym <= n_words)
        & (10 * n_bullet <= 9 * n_lines)
        & (10 * n_ellipsis <= 3 * n_lines)
        & (5 * n_alpha >= 4 * n_words)
        & (n_stop >= 2)
    )
    return F.struct(
        n_words.alias("n_words"),
        total_chars.alias("total_word_chars"),
        n_alpha.alias("n_alpha_words"),
        n_sym.alias("n_symbol_words"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ellipsis.alias("n_ellipsis_lines"),
        n_stop.alias("n_stop_hits"),
        keep.alias("keep"),
    )
