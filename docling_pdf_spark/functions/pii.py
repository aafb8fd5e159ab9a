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

# the common Java/RE2 subset — keep in sync with the DuckDB twin tests.
# RE2 has no lookaround, so the dotted/grouped digit patterns guard
# their context by CONSUMING one boundary char on each side (captured
# and restored in the replacement as $1/$3, translated to \1/\3 for
# DuckDB by the twin builder); a longer dotted run ('1.3.6.1.4.1.311',
# '1.2.3.4.5', '555.123.4567.89') therefore cannot be partially eaten
# mid-token (review-found). Because a consumed boundary is unavailable
# to the next match, the replace runs TWO passes — back-to-back
# occurrences separated by a single char ('1.1.1.1 2.2.2.2') land in
# pass two.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# lead guard: start-of-string or a non-dot non-word char (same letter/
# digit adjacency rejection \b gave, plus dot protection). Trail guard
# additionally allows a sentence-ending dot — a dot NOT followed by a
# digit — so 'fax 555-123-4567.' still redacts while '...4567.89' and
# '1.2.3.4.5' stay whole.
_LEAD = r"(^|[^.\w])"
_TRAIL = r"($|[^.\w]|\.$|\.[^\d])"
_IP_CORE = r"(?:\d{1,3}\.){3}\d{1,3}"
IPV4_RE = rf"{_LEAD}({_IP_CORE}){_TRAIL}"
# three accepted phone shapes: international (+CC ...), US paren form,
# and fully separator-grouped 3-3-4. A date like 2026-08-17 matches
# none (its middle group is 2 digits where 3 are required).
_PHONE_CORE = (
    r"(?:\+\d{1,3}[ .\-]?\d{2,4}[ .\-]?\d{3,4}[ .\-]?\d{3,4}"
    r"|\(\d{3}\)[ .\-]?\d{3}[ .\-]\d{4}"
    r"|\d{3}[ .\-]\d{3}[ .\-]\d{4})"
)
PHONE_RE = rf"{_LEAD}({_PHONE_CORE}){_TRAIL}"

# (name, pattern, replacement with $-refs, number of replace passes)
_KINDS = (
    ("email", EMAIL_RE, "[EMAIL]", 1),
    ("phone", PHONE_RE, "$1[PHONE]$3", 2),
    ("ip", IPV4_RE, "$1[IP]$3", 2),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(col: Column | str) -> Column:
    """Replace every email/phone/IPv4 occurrence with a typed token.
    Email runs FIRST (an email's local part can contain digit groups a
    phone pattern would chew on); IP runs last (already-redacted text
    contains no digits)."""
    out = _c(col)
    for _, pattern, repl, passes in _KINDS:
        for _ in range(passes):
            out = F.regexp_replace(out, F.lit(pattern), F.lit(repl))
    return out


def pii_counts(col: Column | str) -> Column:
    """struct(email, phone, ip) occurrence counts — the observability
    side: corpora report how much was scrubbed. Counted on the
    same-order redaction chain so counts match what redact_pii
    actually replaced (an email is never double-counted as a phone).
    Boundary-guarded kinds count across both replace passes (the
    second pass picks up occurrences whose boundary char the first
    pass consumed)."""
    text = _c(col)
    counts: list[Column] = []
    for name, pattern, repl, passes in _KINDS:
        n = F.lit(0)
        for _ in range(passes):
            n = n + F.regexp_count(text, F.lit(pattern))
            text = F.regexp_replace(text, F.lit(pattern), F.lit(repl))
        counts.append(n.alias(name))
    return F.struct(*counts)


def redact_pii_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL twin of redact_pii over a table — the SAME pattern
    strings (Java∩RE2 common subset) with replacement backrefs
    mechanically translated ($1 → \\1). Generated from _KINDS so the
    Spark chain and the oracle can never drift; used by BOTH the
    driver `pii_redact` correctness entry and the pytest twin."""
    import re as _re

    expr = text_col
    for _, pattern, repl, passes in _KINDS:
        p = pattern.replace("'", "''")
        d_repl = _re.sub(r"\$(\d)", r"\\\1", repl)
        for _ in range(passes):
            expr = f"regexp_replace({expr}, '{p}', '{d_repl}', 'g')"
    return f"SELECT {id_col}, {expr} AS redacted FROM {table}"


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
