"""Checkpoint/resume: kill after k commit groups, rerun, assert no
duplicate/missing doc_ids and completed buckets not reprocessed
(SURVEY.md §5.2.4; north_rule 'resumable from checkpoint with
per-partition lineage + metrics')."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from docling_pdf_spark.checkpoint import ProgressLog
from docling_pdf_spark.fixtures import write_corpus
from docling_pdf_spark.pipeline import run_extraction

N_DOCS = 120
N_BUCKETS = 8


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("resume-corpus") / "documents.parquet")
    write_corpus(path, N_DOCS)
    return path


def test_kill_and_resume_idempotent(spark, corpus, tmp_path):
    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")

    # first run dies after 2 commit groups (4 of 8 buckets done)
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extraction(
            spark, corpus, out, ckpt,
            n_buckets=N_BUCKETS, buckets_per_commit=2, fail_after_commits=2,
        )
    log = ProgressLog(ckpt)
    done_first = log.done_buckets()
    assert len(done_first) == 4

    # record manifest mtimes to prove completed buckets are untouched
    mtimes = {
        b: os.path.getmtime(os.path.join(ckpt, f"bucket={b}", "manifest.json"))
        for b in done_first
    }

    # resume to completion
    run_extraction(spark, corpus, out, ckpt, n_buckets=N_BUCKETS, buckets_per_commit=2)
    assert ProgressLog(ckpt).done_buckets() == set(range(N_BUCKETS))
    for b, t in mtimes.items():
        assert os.path.getmtime(os.path.join(ckpt, f"bucket={b}", "manifest.json")) == t

    # output complete, no dups
    result = spark.read.parquet(out).select("doc_id").toPandas()["doc_id"]
    expected = pd.read_parquet(corpus)["doc_id"]
    assert sorted(result.tolist()) == sorted(expected.tolist())
    assert result.is_unique


def test_manifest_lineage_and_metrics(spark, corpus, tmp_path):
    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")
    run_extraction(spark, corpus, out, ckpt, n_buckets=4, input_snapshot="snap-1")

    manifests = ProgressLog(ckpt).all_manifests()
    assert {m.partition_id for m in manifests} == {0, 1, 2, 3}
    total_docs = sum(m.n_docs for m in manifests)
    assert total_docs == len(pd.read_parquet(corpus))
    for m in manifests:
        assert m.status == "done"
        assert m.lineage["input_snapshot"] == "snap-1"
        assert m.lineage["partition_key"] == f"bucket={m.partition_id}"
        assert m.lineage["code_version"]
        assert m.started_at and m.finished_at
        assert set(m.metrics) == {"chars", "words", "pages"}
        assert m.n_ok + m.n_failed == m.n_docs

    # manifest JSON is valid and atomic-rename left no temp files
    for b in range(4):
        d = os.path.join(ckpt, f"bucket={b}")
        assert os.listdir(d) == ["manifest.json"]
        json.load(open(os.path.join(d, "manifest.json")))


def test_noop_when_all_buckets_done(spark, corpus, tmp_path):
    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")
    run_extraction(spark, corpus, out, ckpt, n_buckets=4)
    before = {
        b: os.path.getmtime(os.path.join(ckpt, f"bucket={b}", "manifest.json"))
        for b in range(4)
    }
    run_extraction(spark, corpus, out, ckpt, n_buckets=4)  # resume = no-op
    after = {
        b: os.path.getmtime(os.path.join(ckpt, f"bucket={b}", "manifest.json"))
        for b in range(4)
    }
    assert before == after


def test_completeness_guard_rejects_empty_bucket(spark, corpus, tmp_path, monkeypatch):
    """Reference main.py:232-236 analog (completed task with no result
    → 500): a bucket whose input slice is non-empty must never be
    committed 'done' with zero output rows — inject an extractor that
    silently drops everything and assert the commit refuses."""
    import docling_pdf_spark.pipeline as pl

    real_extract = pl.extract

    def dropping_extract(df, num_partitions=None, salt_mode="auto"):
        out = real_extract(df, num_partitions=num_partitions, salt_mode=salt_mode)
        return out.where("1 = 0")  # simulate a swallowed-output bug

    monkeypatch.setattr(pl, "extract", dropping_extract)
    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(RuntimeError, match="completeness guard"):
        run_extraction(spark, corpus, out, ckpt, n_buckets=4)
    # nothing was marked done: resume will reprocess every bucket
    assert ProgressLog(ckpt).done_buckets() == set()

    # and the real pipeline completes the same job untouched
    monkeypatch.setattr(pl, "extract", real_extract)
    run_extraction(spark, corpus, out, ckpt, n_buckets=4)
    assert ProgressLog(ckpt).done_buckets() == {0, 1, 2, 3}


def test_lineage_guard_rejects_changed_input(spark, corpus, tmp_path):
    """A completed bucket from a different input snapshot must abort the
    resume instead of silently stitching two inputs together."""
    import shutil

    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")
    moved = str(tmp_path / "documents.parquet")
    shutil.copy(corpus, moved)
    run_extraction(spark, moved, out, ckpt, n_buckets=4)

    # mutate the input file (append a byte → fingerprint changes)
    with open(moved, "ab") as f:
        f.write(b"\x00")
    with pytest.raises(RuntimeError, match="lineage mismatch"):
        run_extraction(spark, moved, out, ckpt, n_buckets=4)
