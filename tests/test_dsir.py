"""DSIR importance weights (operators/dsir.py): hashed-ngram
target/raw log-likelihood-ratio scores must be value-identical to the
DuckDB twin (portable bucket hash; ROUND(.,4) float contract), and
the scores must actually rank target-like text above off-target text
on a planted corpus."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from docling_pdf_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_oracle_sql,
    dsir_weights,
)
from tests.test_queries_vs_duckdb import SF_DIR, _assert_matches

TARGET_MOD = 17


def _docs(spark, d=SF_DIR):
    return spark.read.parquet(f"{d}/documents.parquet")


def _spark_dsir(spark, d):
    docs = _docs(spark, d)
    target = docs.where(F.col("doc_id") % TARGET_MOD == 0)
    ratios = dsir_log_ratios(docs, target)
    return dsir_weights(docs, ratios)


def test_matches_duckdb(spark):
    _assert_matches(
        spark, "dsir_weights", _spark_dsir, dsir_oracle_sql(TARGET_MOD)
    )


def test_target_docs_score_higher_on_planted_corpus(spark):
    """Two disjoint-vocabulary registers; the target exemplars come
    from register A. Every register-A doc must outscore every
    register-B doc (the paper's separation property at its
    easiest)."""
    rows = []
    for i in range(40):
        words = " ".join(
            f"alpha{j % 11} quality{(i + j) % 7} prose{j % 5}"
            for j in range(30)
        )
        rows.append((i, words, "A"))
    for i in range(40, 80):
        words = " ".join(
            f"spam{j % 3} zzz{(i * j) % 13} noise{j % 2}"
            for j in range(30)
        )
        rows.append((i, words, "B"))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, register string"
    )
    target = docs.where(
        (F.col("register") == "A") & (F.col("doc_id") % 4 == 0)
    )
    ratios = dsir_log_ratios(docs, target)
    w = {
        r.doc_id: r.dsir_logweight
        for r in dsir_weights(docs, ratios).collect()
    }
    a = [w[i] for i in range(40)]
    b = [w[i] for i in range(40, 80)]
    assert min(a) > max(b)


def test_short_docs_get_zero_weight(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four"), (2, "single")],
        "doc_id bigint, text string",
    )
    ratios = dsir_log_ratios(docs, docs.where(F.col("doc_id") == 1))
    out = {
        r.doc_id: (r.n_grams, r.dsir_logweight)
        for r in dsir_weights(docs, ratios).collect()
    }
    assert out[2] == (0, 0.0)
    assert out[1][0] == 3  # bigrams with multiplicity


def test_weight_identity_is_additive_over_grams(spark):
    """The doc weight is exactly the sum of its grams' bucket
    log-ratios — verified independently by re-aggregating the melted
    join in Python."""
    docs = _docs(spark).limit(50)
    target = docs.where(F.col("doc_id") % 5 == 0)
    ratios = dsir_log_ratios(docs, target)
    from docling_pdf_spark.operators.dsir import _bucketed_grams

    melted = (
        _bucketed_grams(docs, 2, 10_000, "doc_id", "text")
        .join(ratios, "bucket")
        .collect()
    )
    expect = {}
    for r in melted:
        expect[r.doc_id] = expect.get(r.doc_id, 0.0) + r.log_ratio
    got = {
        r.doc_id: r.dsir_logweight
        for r in dsir_weights(docs, ratios).collect()
        if r.n_grams > 0
    }
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - round(expect[k], 4)) < 1e-9, k


def test_fast_hash_mode_preserves_separation(spark):
    """The xxhash64 production path has no DuckDB twin, but it must
    preserve the separation property (same bucketing quality)."""
    rows = []
    for i in range(30):
        rows.append((i, " ".join(
            f"alpha{j % 11} quality{(i + j) % 7}" for j in range(25)), "A"))
    for i in range(30, 60):
        rows.append((i, " ".join(
            f"spam{j % 3} zzz{(i * j) % 13}" for j in range(25)), "B"))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, register string"
    )
    target = docs.where(
        (F.col("register") == "A") & (F.col("doc_id") % 4 == 0)
    )
    ratios = dsir_log_ratios(docs, target, hash_mode="fast")
    w = {
        r.doc_id: r.dsir_logweight
        for r in dsir_weights(docs, ratios, hash_mode="fast").collect()
    }
    assert min(w[i] for i in range(30)) > max(w[i] for i in range(30, 60))
