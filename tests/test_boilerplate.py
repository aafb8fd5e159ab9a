"""Corpus-frequency line boilerplate removal
(operators/boilerplate.py): planted footer/banner fixtures with exact
expectations, byte-faithful round-trip on untouched docs, DuckDB-twin
parity on a planted corpus AND on the (repeat-free) sf0.01 documents
table, and plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_pdf_spark.operators.boilerplate import (
    boilerplate_lines,
    strip_boilerplate_lines,
    strip_boilerplate_sql,
)
from tests.test_queries_vs_duckdb import SF_DIR, _canon_frame

FOOTER = "Copyright Example Corp all rights reserved"
BANNER = "Accept cookies to continue"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


PLANTED = [
    (1, f"unique alpha content\n{FOOTER}"),
    (2, f"unique beta content\n\n{BANNER}\n{FOOTER}"),
    (3, f"{FOOTER}\nunique gamma content"),
    (4, f"unique delta content\n{BANNER}"),
    (5, "entirely unique epsilon content with no shared lines"),
    (6, None),  # NULL text must survive as empty, not vanish
]


def test_boilerplate_lines_frequency(spark):
    freq = {
        r["line_norm"]: r["n_docs"]
        for r in boilerplate_lines(_docs(spark, PLANTED), min_docs=2).collect()
    }
    assert freq == {FOOTER.lower(): 3, BANNER.lower(): 2}


def test_strip_removes_planted_boilerplate(spark):
    out = {
        r["doc_id"]: (r["text"], r["n_boilerplate_removed"])
        for r in strip_boilerplate_lines(
            _docs(spark, PLANTED), min_docs=2
        ).collect()
    }
    assert out[1] == ("unique alpha content", 1)
    # the EMPTY line is structure (below min_line_chars): kept
    assert out[2] == ("unique beta content\n", 2)
    assert out[3] == ("unique gamma content", 1)
    assert out[4] == ("unique delta content", 1)
    assert out[5] == (PLANTED[4][1], 0)  # untouched: byte-identical
    assert out[6] == ("", 0)


def test_min_docs_threshold(spark):
    # at min_docs=3 only the footer (3 docs) is boilerplate
    out = {
        r["doc_id"]: r["n_boilerplate_removed"]
        for r in strip_boilerplate_lines(
            _docs(spark, PLANTED), min_docs=3
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0, 6: 0}


def test_within_doc_repeat_counts_once(spark):
    """A line repeated 5x inside ONE doc is not corpus boilerplate —
    frequency is DISTINCT docs (that's repetition_stats' job)."""
    rows = [(1, "\n".join(["same line here"] * 5)), (2, "other text")]
    assert boilerplate_lines(_docs(spark, rows), min_docs=2).count() == 0


def test_rejects_min_docs_below_two(spark):
    with pytest.raises(ValueError):
        boilerplate_lines(_docs(spark, PLANTED), min_docs=1)


def _duck_with(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con


def test_matches_duckdb_on_planted_corpus(spark):
    sdf = (
        strip_boilerplate_lines(_docs(spark, PLANTED), min_docs=2)
        .toPandas()
    )
    ddf = _duck_with(PLANTED).execute(strip_boilerplate_sql(min_docs=2)).df()
    assert _canon_frame(sdf) == _canon_frame(ddf)


def test_matches_duckdb_on_sf001(spark):
    """The real table has no repeated lines — the parity that matters
    here is the byte-faithful identity round-trip through
    explode/reassemble on both engines."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sdf = strip_boilerplate_lines(docs, min_docs=3).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    ddf = con.execute(strip_boilerplate_sql(min_docs=3)).df()
    assert (sdf["n_boilerplate_removed"] == 0).all()
    assert _canon_frame(sdf) == _canon_frame(ddf)


def test_plan_no_python_no_forced_broadcast(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        strip_boilerplate_lines(docs, min_docs=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan, marker
    # no broadcast HINT in the operator source (AQE may choose one)
    import inspect

    import docling_pdf_spark.operators.boilerplate as bp

    assert "broadcast" not in inspect.getsource(bp.strip_boilerplate_lines)


SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind string, text string, "
    "media_ref string, offset int>>"
)


def _extracted_doc(i, pages, media=None, tables=()):
    spans, off = [], 0
    for p in pages:
        spans.append(("text", p, None, off))
        off += len(p) + 1
    for t in tables:
        spans.append(("table", t, None, -1))
    for ref, cap, link in media or []:
        spans.append(("media", cap, ref, link))
    return (f"d{i}", spans)


def test_strip_spans_rebuilds_offsets_and_media_links(spark):
    from docling_pdf_spark.operators.boilerplate import strip_boilerplate_spans

    p0 = f"{FOOTER}\nreal content page zero"
    p1 = "second page content"
    rows = [
        # media span links to page 1 by its OLD cumulative offset
        _extracted_doc(0, [p0, p1], media=[("m1", "cap", len(p0) + 1)]),
        _extracted_doc(1, [f"intro line\n{FOOTER}"], tables=("a|b",)),
        _extracted_doc(2, [FOOTER]),
        _extracted_doc(3, ["totally unique doc three"]),
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_spans(df, min_docs=3).collect()
    }

    d0 = out["d0"]
    assert d0["n_boilerplate_removed"] == 1
    kinds = [(s["kind"], s["text"], s["offset"]) for s in d0["spans"]]
    # footer gone from page 0; page 1's offset recomputed: len(page0')+1
    assert kinds[0] == ("text", "real content page zero", 0)
    assert kinds[1] == ("text", "second page content", 23)
    # the media link followed its text block to the NEW offset
    assert kinds[2] == ("media", "cap", 23)

    d1 = out["d1"]
    assert d1["n_boilerplate_removed"] == 1
    assert [s["text"] for s in d1["spans"]] == ["intro line", "a|b"]
    assert [s["offset"] for s in d1["spans"]] == [0, -1]  # table untouched

    # every line boilerplate → the span is DROPPED (extract.py never
    # emits empty text spans; spans_audit would flag one)
    assert list(out["d2"]["spans"]) == []
    assert out["d2"]["n_boilerplate_removed"] == 1

    # untouched doc: spans pass through the fast path bit-identically
    assert out["d3"]["n_boilerplate_removed"] == 0
    assert [tuple(s) for s in out["d3"]["spans"]] == [
        ("text", "totally unique doc three", None, 0)
    ]


def test_strip_spans_output_stays_audit_clean(spark):
    """The rebuilt arrays must satisfy the §1.4 encoding invariants —
    spans_audit (strict offset monotonicity, no orphan media) is the
    independent checker."""
    from docling_pdf_spark.operators.boilerplate import strip_boilerplate_spans
    from docling_pdf_spark.operators.spans_audit import spans_audit

    rows = [
        _extracted_doc(
            i,
            [f"{FOOTER}\nunique page {i} alpha", f"page two {i}", BANNER],
            media=[("m", "c", 0)],
        )
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    audited = spans_audit(strip_boilerplate_spans(df, min_docs=3))
    assert all(r["audit_ok"] for r in audited.collect())
