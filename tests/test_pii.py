"""PII detection/redaction (functions/pii.py): hand cases for each
pattern family and its deliberate non-matches, a DuckDB twin running
the SAME regex strings (the patterns live in the Java∩RE2 subset),
and the curate --redact-pii end-to-end path."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


CASES = [
    ("mail me at jane.doe+x@example.co.uk today",
     "mail me at [EMAIL] today"),
    ("call +49 171 555 0100 or (212) 555-0188",
     "call [PHONE] or [PHONE]"),
    ("server 10.0.42.7 timed out", "server [IP] timed out"),
    # deliberate non-matches: dates, versions, times, plain ints
    ("released 2026-08-17 at 12:30, v1.2.3 build 4567",
     "released 2026-08-17 at 12:30, v1.2.3 build 4567"),
    ("order 123456789 shipped", "order 123456789 shipped"),
    # a longer digit run must not be PARTIALLY eaten by the 3-3-4 form
    ("ref 1234-567-8901 attached", "ref 1234-567-8901 attached"),
    # longer DOTTED runs must not be partially eaten either (OIDs,
    # 5-part versions, dot-grouped digit runs with a tail)
    ("OID 1.3.6.1.4.1.311 here", "OID 1.3.6.1.4.1.311 here"),
    ("release 1.2.3.4.5 shipped", "release 1.2.3.4.5 shipped"),
    ("num 555.123.4567.89 logged", "num 555.123.4567.89 logged"),
    # letter-adjacent dotted runs are identifiers, not IPs
    ("build v1.2.3.4 ready", "build v1.2.3.4 ready"),
    # back-to-back occurrences separated by ONE char: the consumed
    # boundary is restored and the second pass picks up the neighbor
    ("peers 1.1.1.1 2.2.2.2 up", "peers [IP] [IP] up"),
    # grouped 3-3-4 phone
    ("fax 555-123-4567.", "fax [PHONE]."),
]


def test_redact_pii_hand_cases(spark):
    from docling_pdf_spark.functions.pii import redact_pii

    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(CASES)],
                               ["i", "t"])
    got = {r["i"]: r["r"] for r in
           df.select("i", redact_pii("t").alias("r")).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}"


def test_pii_counts(spark):
    from docling_pdf_spark.functions.pii import pii_counts

    df = spark.createDataFrame(
        [("a@b.io and c@d.org, call 555-123-4567, host 1.2.3.4",)], ["t"]
    )
    row = df.select(pii_counts("t").alias("p")).collect()[0]["p"]
    assert (row["email"], row["phone"], row["ip"]) == (2, 1, 1)


def test_redaction_matches_duckdb_on_corpus(spark):
    """The same pattern strings produce byte-identical redaction in
    DuckDB (RE2) over the sf0.01 corpus — pytest-level exactness (the
    driver registry is at its 50-entry cap)."""
    from docling_pdf_spark.functions.pii import redact_pii, redact_pii_oracle_sql

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sdf = (
        docs.select("doc_id", redact_pii("text").alias("r"))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    # the generated twin (shared with the driver's pii_redact oracle):
    # same pattern strings, $1 backrefs translated to RE2's \1
    con = duckdb.connect()
    ddf = con.execute(
        redact_pii_oracle_sql(f"'{SF_DIR}/documents.parquet'")
        .replace("AS redacted", "AS r") + " ORDER BY doc_id"
    ).df().reset_index(drop=True)
    assert len(sdf) == len(ddf) == 500
    assert (sdf["r"] == ddf["r"]).all()


def test_curate_redact_pii_end_to_end(spark, tmp_path):
    import pyarrow.parquet as pq
    import pyarrow as pa

    from docling_pdf_spark.schemas import DOCUMENTS_PA
    from jobs.curate import curate

    text = ("please contact support at help@corp.example or on "
            "555-123-4567 for assistance with anything at all here")
    doc = {
        "doc_id": "pii-doc",
        "spans": [{"kind": "text", "text": text, "media_ref": None,
                   "offset": 0}],
    }
    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist([doc], schema=DOCUMENTS_PA), path)
    out = str(tmp_path / "curated")
    curate(spark, path, out, min_chars=10, min_tokens=3, redact_pii=True)
    spans = spark.read.parquet(out).select(
        F.explode("spans").alias("s")
    ).select("s.text").collect()
    joined = "\n".join(r["text"] for r in spans)
    assert "[EMAIL]" in joined and "[PHONE]" in joined
    assert "help@corp.example" not in joined
    assert "555-123-4567" not in joined
