"""End-to-end curation pipeline: every funnel stage must drop exactly
the planted offenders (jobs/curate.py — the operator composition for
the training-data use case)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from docling_pdf_spark.schemas import DOCUMENTS_PA

BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "shuffles partitions across the cluster and the arrow batches flow "
    "through vectorized pipelines without touching python at all today"
)


def _doc(doc_id: str, text: str) -> dict:
    return {
        "doc_id": doc_id,
        "spans": [{"kind": "text", "text": text, "media_ref": None, "offset": 0}],
    }


def test_curate_funnel_drops_each_planted_offender(spark, tmp_path):
    from jobs.curate import curate

    rows = [
        _doc("keep-1", BASE),
        _doc("keep-2", "an entirely different long document about mountain "
                       "weather patterns and the seasonal snowfall records "
                       "measured across forty alpine stations since twenty ten"),
        _doc("exact-dup", BASE),                         # exact dup of keep-1
        _doc("near-dup", BASE.replace("lazy", "sleepy")),  # near dup of keep-1
        _doc("too-short", "tiny text"),                  # fails min_chars
        _doc("too-numeric", " ".join(str(i) for i in range(40))),  # digit gate
    ]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=DOCUMENTS_PA), src)
    out = str(tmp_path / "curated")

    funnel = curate(spark, src, out, min_chars=80, min_tokens=10,
                    max_digit_ratio=0.3, jaccard=0.5)

    assert funnel["n_input"] == 6
    assert funnel["dropped_quality"] == 2      # too-short + too-numeric
    assert funnel["dropped_exact_dups"] == 1   # keep-1/exact-dup collapse to one
    assert funnel["dropped_near_dups"] == 1    # near-dup (higher id of the pair)
    assert funnel["n_curated"] == 2

    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # exact dedup keeps the LOWEST doc_id per hash ('exact-dup' < 'keep-1')
    assert kept == {"exact-dup", "keep-2"}


def test_curate_winnow_mode_catches_the_near_dup(spark, tmp_path):
    """The winnow near-dup mode drops the same planted near-dup (its
    shared passages guarantee shared fingerprints)."""
    from jobs.curate import curate

    rows = [
        _doc("keep-1", BASE),
        _doc("near-dup", BASE.replace("lazy", "sleepy")),
        _doc("keep-2", "an entirely different long document about mountain "
                       "weather patterns and the seasonal snowfall records "
                       "measured across forty alpine stations since twenty ten"),
    ]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=DOCUMENTS_PA), src)
    out = str(tmp_path / "curated")
    funnel = curate(spark, src, out, min_chars=80, near_dup="winnow")
    assert funnel["dropped_near_dups"] == 1
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {"keep-1", "keep-2"}
