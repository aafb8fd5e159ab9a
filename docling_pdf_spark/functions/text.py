"""Text-analysis column expressions (token counting, quality signals,
fingerprinting, stopword language signals) — pure pyspark.sql.functions
compositions mirroring the reference's string aggregates
(docling-pdf pdf_extractor.py:456-457 whitespace word count et al.)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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


def stopword_hits(col: Column | str, word: str) -> Column:
    """Occurrences of a space-delimited stopword via replace-and-measure
    (language-ID voting signal)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(f" {word} "), F.lit(" "))))
        / F.lit(len(word) + 1)
    ).cast("long")
