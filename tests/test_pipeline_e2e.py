"""End-to-end: distributed Spark output == serial oracle output,
span-by-span (kind, text, media_ref, order) per doc_id — the north-rule
correctness gate (SURVEY.md §5.2.3)."""

from __future__ import annotations

import pandas as pd
import pytest

from docling_pdf_spark.core.extract import OUTPUT_COLUMNS
from docling_pdf_spark.fixtures import write_corpus
from docling_pdf_spark.oracle import run_oracle
from docling_pdf_spark.pipeline import extract, salted_repartition, with_cost

N_DOCS = 300


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus") / "documents.parquet")
    write_corpus(path, N_DOCS)
    return path


def _norm_spans(spans):
    items = [] if spans is None else list(spans)
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in items]


def _assert_frames_equal(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> None:
    assert len(spark_df) == len(oracle_df)
    s = spark_df.sort_values("doc_id", ignore_index=True)
    o = oracle_df.sort_values("doc_id", ignore_index=True)
    assert s["doc_id"].tolist() == o["doc_id"].tolist()
    for col in OUTPUT_COLUMNS:
        if col == "spans":
            continue
        sv, ov = s[col].tolist(), o[col].tolist()
        assert sv == ov, f"column {col} mismatch"
    for i, (ss, os_) in enumerate(zip(s["spans"], o["spans"])):
        assert _norm_spans(ss) == _norm_spans(os_), f"span mismatch doc {s['doc_id'][i]}"


def test_spark_equals_oracle_span_by_span(spark, corpus):
    docs = spark.read.parquet(corpus)
    result = extract(docs, num_partitions=8).toPandas()
    expected = run_oracle(pd.read_parquet(corpus))
    _assert_frames_equal(result, expected)


def test_extract_without_repartition_same_result(spark, corpus):
    docs = spark.read.parquet(corpus)
    result = extract(docs).toPandas()
    expected = run_oracle(pd.read_parquet(corpus))
    _assert_frames_equal(result, expected)


def test_salted_repartition_spreads_heavy_docs(spark, corpus):
    """The oversized cohort must not co-locate: with the salt, no
    partition holds more than ceil(heavy/nparts)+1 heavy docs."""
    from pyspark.sql import functions as F

    docs = with_cost(spark.read.parquet(corpus))
    heavy_ids = {
        r["doc_id"]
        for r in docs.where(F.col("_cost_bytes") >= 65536).select("doc_id").collect()
    }
    if not heavy_ids:
        pytest.skip("corpus drew no oversized docs at this size")
    nparts = 8
    df = salted_repartition(spark.read.parquet(corpus), nparts)
    pid = df.withColumn("pid", F.spark_partition_id()).select("doc_id", "pid")
    counts: dict[int, int] = {}
    for r in pid.collect():
        if r["doc_id"] in heavy_ids:
            counts[r["pid"]] = counts.get(r["pid"], 0) + 1
    assert max(counts.values()) <= -(-len(heavy_ids) // nparts) + 1


def test_output_schema_stable(spark, corpus):
    docs = spark.read.parquet(corpus)
    out = extract(docs)
    assert [f.name for f in out.schema.fields] == OUTPUT_COLUMNS
    span_type = out.schema["spans"].dataType.elementType
    assert [f.name for f in span_type.fields] == ["kind", "text", "media_ref", "offset"]
