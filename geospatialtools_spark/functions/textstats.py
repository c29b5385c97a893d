"""Text-analysis operators for the training-data pipeline surface.

All pure Catalyst expressions over a ``text`` column (no Python in the hot
path, whole-stage codegen). Designed for the ``documents`` table
(doc_id, text, lang, source, n_chars) and for the span-level text of the
interleaved doc table (apply to ``span.text`` after ``explode``).

Every function is deterministic and ANSI-SQL-expressible, so each has a
DuckDB oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish word-piece pattern: runs of letters, runs of digits, or single
# non-space punctuation — a public GPT-2-style pre-tokenizer simplification.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)) \
            .otherwise(F.size(F.split(t, TOKEN_SPLIT_RE))).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish word pieces (letters / digit runs / punct singles)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


def upper_ratio(text: Column) -> Column:
    n = F.length(text)
    up = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(up.cast("double") / n)


def digit_ratio(text: Column) -> Column:
    n = F.length(text)
    d = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(d.cast("double") / n)


# Small fixed stopword inventories for the language-ID heuristic. Function
# words are the standard public signal for statistical language ID (n-gram /
# stopword-hit methods); 8 high-frequency words per language suffice at
# document granularity.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "dans"],
    "es": ["el", "los", "las", "es", "una", "por", "con", "para"],
}


def _hits(text: Column, words: list[str]) -> Column:
    """Number of stopword OCCURRENCES (word-boundary matches, case-insensitive)."""
    lower = F.lower(text)
    total = F.lit(0)
    for w in words:
        pat = rf"\b{w}\b"
        removed = F.length(lower) - F.length(F.regexp_replace(lower, pat, ""))
        total = total + removed / len(w)
    return total.cast("long")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Stopword occurrences / whitespace tokens (quality signal)."""
    n = token_count(text)
    return F.when(n == 0, F.lit(0.0)) \
            .otherwise(_hits(text, STOPWORDS[lang]).cast("double") / n)


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits.

    Ties and zero-hit documents resolve to 'und' ... unless exactly one
    language is tied at the max (ties broken by language-code sort order,
    deterministic in both engines).
    """
    hits = {lang: _hits(text, ws) for lang, ws in sorted(STOPWORDS.items())}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in sorted(hits, reverse=True):  # reversed: first lang wins ties
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length band + stopword presence -
    punctuation/digit noise. Deterministic, SQL-expressible."""
    n_tok = token_count(text)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    sw_ok = F.when(sw >= 0.05, F.lit(0.3)).otherwise(sw / 0.05 * 0.3)
    noise = punct_ratio(text) * 0.5 + digit_ratio(text) * 0.5
    noise_pen = F.least(noise * 0.6, F.lit(0.3))
    return F.round(len_ok + sw_ok + (0.3 - noise_pen), 6)


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    strip punctuation."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text (the classic
    Broder-style "document sketch key" reduced to one hash; near-dup variants
    live in ``dedup``)."""
    return F.md5(normalize_text(text))


# PII patterns shared by the Spark expression and the DuckDB oracle twin —
# plain ASCII classes only, so Java regex and RE2 agree token-for-token
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_PHONE = "[+][0-9][0-9 -]{6,}[0-9]"
PII_IPV4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def redact_pii(text: Column) -> Column:
    """Scrub emails, international-format phone numbers, and IPv4 literals
    to typed placeholder tokens — the pre-training privacy pass. Pure
    Catalyst regexp_replace chain (codegen'd, no Python); order matters:
    emails first (their dotted domains would otherwise half-match the IPv4
    pattern's digit runs)."""
    t = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    t = F.regexp_replace(t, PII_IPV4, "<IP>")
    t = F.regexp_replace(t, PII_PHONE, "<PHONE>")
    return t


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """Match counts per PII class (audit table before the scrub)."""
    return (F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), F.lit(0))),
            F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), F.lit(0))),
            F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), F.lit(0))))
