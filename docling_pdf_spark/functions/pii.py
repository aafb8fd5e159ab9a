"""PII detection + redaction expressions — the scrub pass a
training-data pipeline runs before releasing a corpus (C4 and most
published web-corpus recipes strip emails/phones; see also the
BigScience ROOTS PII pipeline for the pattern family).

Pure JVM `regexp_replace`/`regexp_count` — no Python in the hot path.
The patterns are deliberately written in the COMMON subset of Java
regex (Spark) and RE2 (DuckDB): no backreferences, no lookbehind — so
the DuckDB twin used by the pytest exactness check runs the very same
strings.

Phone matching is intentionally conservative (international `+` form
or separator-grouped 3-3-4-ish forms, 9+ digits) — aggressive phone
regexes eat order ids, timestamps and version numbers at corpus scale;
false positives destroy far more training signal than missed digits
leak.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the common Java/RE2 subset — keep in sync with the DuckDB twin tests
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# three accepted shapes: international (+CC ...), US paren form, and
# fully separator-grouped 3-3-4. A date like 2026-08-17 matches none
# (its middle group is 2 digits where 3 are required). The digit-led
# alternative carries a LEADING \b too, so the tail of a longer digit
# run (order id '1234-567-8901') cannot be partially redacted
# (review-found).
PHONE_RE = (
    r"(?:\+\d{1,3}[ .\-]?\d{2,4}[ .\-]?\d{3,4}[ .\-]?\d{3,4}"
    r"|\(\d{3}\)[ .\-]?\d{3}[ .\-]\d{4}"
    r"|\b\d{3}[ .\-]\d{3}[ .\-]\d{4})\b"
)

_KINDS = (
    ("email", EMAIL_RE, "[EMAIL]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ip", IPV4_RE, "[IP]"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(col: Column | str) -> Column:
    """Replace every email/phone/IPv4 occurrence with a typed token.
    Email runs FIRST (an email's local part can contain digit groups a
    phone pattern would chew on); IP runs last (already-redacted text
    contains no digits)."""
    out = _c(col)
    for _, pattern, token in _KINDS:
        out = F.regexp_replace(out, F.lit(pattern), F.lit(token))
    return out


def pii_counts(col: Column | str) -> Column:
    """struct(email, phone, ip) occurrence counts — the observability
    side: corpora report how much was scrubbed. Counted on the
    same-order redaction chain so counts match what redact_pii
    actually replaced (an email is never double-counted as a phone)."""
    text = _c(col)
    counts = []
    for name, pattern, token in _KINDS:
        counts.append(F.regexp_count(text, F.lit(pattern)).alias(name))
        text = F.regexp_replace(text, F.lit(pattern), F.lit(token))
    return F.struct(*counts)


def redact_spans(spans: Column | str) -> Column:
    """redact_pii over every text field of a spans array (the curated
    table's payload shape) — one JVM transform, struct rebuilt
    field-for-field."""
    return F.transform(
        _c(spans),
        # withField, not a field-for-field struct rebuild: a field added
        # to the span schema later must survive redaction unchanged
        # instead of being silently dropped (review-found)
        lambda s: s.withField("text", redact_pii(s["text"])),
    )
