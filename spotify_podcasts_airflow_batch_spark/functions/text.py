"""Text-analysis column functions (SURVEY.md §2 C-series primitives).

All built-in ``pyspark.sql.functions`` — tokenization, shingling,
quality metrics and language scoring run inside whole-stage codegen.
The formulas are mirrored 1:1 by the DuckDB oracle SQL in
plans/text.py; any change here must change there.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists per language for the n-gram/stopword
# language-ID heuristic. Order matters: ties resolve to the first
# language in LANGS.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "los", "que", "y"),
    "fr": ("le", "les", "des", "et", "une"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}
LANGS = tuple(LANG_STOPWORDS)


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text → empty array."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (space-joined). Docs with < k tokens
    produce no shingles."""
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    return F.array_distinct(sh)


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Number of token occurrences that are in ``words``."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-space chars that are not [a-z0-9]."""
    t = F.regexp_replace(text, r"\s", "")
    nonword = F.length(F.regexp_replace(t, r"[a-z0-9]", ""))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        nonword / F.length(t)
    )


def quality_score(n_toks: Column, stop_ratio: Column, p_ratio: Column) -> Column:
    """Heuristic quality in [0,1]: length credit (saturates at 64
    tokens) × stopword credit × punctuation penalty. The exact formula
    is arbitrary but frozen — the oracle mirrors it."""
    length_credit = F.least(n_toks / F.lit(64.0), F.lit(1.0))
    stop_credit = F.least(stop_ratio * 4.0, F.lit(1.0))
    return length_credit * (0.5 + 0.5 * stop_credit) * (1.0 - p_ratio)


# --- PII redaction ----------------------------------------------------
#
# The C4/RefinedWeb-style scrub pass: regex families for emails, IPv4
# addresses, and US-style phone numbers, applied in a fixed order so
# Spark (Java regex) and the DuckDB oracle (RE2) produce identical
# output. Patterns deliberately stay inside the syntax subset the two
# engines share: character classes, bounded repetition, and \b word
# boundaries — no backreferences, no lookaround.

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-family match counts, measured on the RAW text (before any
    replacement, so families never see each other's tokens)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for kind, pat, _ in PII_PATTERNS
    }


def pii_scrub(text: Column) -> Column:
    """Replace every PII match with its family token, families applied
    in PII_PATTERNS order (email → ip → phone, so the IP pass cannot
    consume digit runs the phone pass should see, and vice versa is
    impossible by construction)."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
