"""Text-analysis column expressions (token counting, quality signals,
fingerprinting, stopword language signals) — pure pyspark.sql.functions
compositions mirroring the reference's string aggregates
(docling-pdf pdf_extractor.py:456-457 whitespace word count et al.)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_col(col: Column | str) -> Column:
    """str-or-Column coercion — the single repo-wide definition."""
    return F.col(col) if isinstance(col, str) else col


def token_count(col: Column | str) -> Column:
    """Whitespace token count (len(text.split()) semantics,
    pdf_extractor.py:456)."""
    return F.size(F.split(F.trim(F.col(col) if isinstance(col, str) else col), r"\s+"))


def digit_ratio(col: Column | str) -> Column:
    """Fraction of characters that are digits (quality scoring signal)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))).cast(
        "double"
    ) / F.length(c).cast("double")


def normalized_fingerprint(col: Column | str) -> Column:
    """md5 over casefolded, punctuation-stripped text — the
    normalize-then-hash document fingerprint."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", ""))


# GPT-2-family pretokenizer pattern (public: the regex from the GPT-2
# encoder / tiktoken family), minus the lookahead (unsupported by some
# regex engines and irrelevant for counting): contractions, letter
# runs, digit runs, punctuation runs, whitespace runs.
BPE_PRETOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: the number of pretokenizer matches — the
    standard cheap estimate of LLM token usage (each pretoken maps to
    ≥1 BPE tokens; for plain ASCII prose it is within a few % of the
    true count). JVM-side regexp_extract_all, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_PATTERN), F.lit(0)))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are neither alphanumeric nor
    whitespace (quality scoring signal)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", "")).cast("double")
        / F.length(c).cast("double")
    )


def stopword_hits(col: Column | str, word: str) -> Column:
    """Occurrences of a space-delimited stopword via replace-and-measure
    (language-ID voting signal)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(f" {word} "), F.lit(" "))))
        / F.lit(len(word) + 1)
    ).cast("long")
