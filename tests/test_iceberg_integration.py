"""Jar-gated Iceberg integration test (r2 VERDICT #7).

The sandbox has no network, so the iceberg-spark-runtime jar has never
been present and the TableIO iceberg mode (create → overwritePartitions
→ MERGE INTO → expire_snapshots, docling_pdf_spark/sources/io.py) is
code-complete but UNVERIFIED. This module encodes the day-one proof:
the moment a runtime jar lands on the classpath, `pytest` exercises the
whole path against a local hadoop-catalog warehouse; until then every
test here reports SKIPPED (visibly, not silently green).

Cluster launch that makes these run:
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> ...
"""

from __future__ import annotations

import glob
import os

import pytest


def _iceberg_jar_present() -> bool:
    """Is an iceberg-spark-runtime jar on the classpath? Checked via the
    pyspark jars dir plus the usual extra-classpath env knobs — cheap
    and session-free (a ClassNotFound probe would need a live JVM)."""
    import pyspark

    candidates = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars", "iceberg-spark-runtime*")
    )
    for env in ("SPARK_SUBMIT_OPTS", "PYSPARK_SUBMIT_ARGS", "SPARK_CLASSPATH"):
        if "iceberg-spark-runtime" in os.environ.get(env, ""):
            return True
    return bool(candidates)


pytestmark = pytest.mark.skipif(
    not _iceberg_jar_present(),
    reason="iceberg-spark-runtime jar not on the classpath (offline sandbox); "
    "the TableIO iceberg mode remains code-complete but unverified",
)


@pytest.fixture()
def iceberg_io(spark, tmp_path):
    """TableIO in iceberg mode against a throwaway hadoop catalog.
    Catalog plugins are lazily instantiated, so the confs can be set on
    the shared session at runtime."""
    from docling_pdf_spark.sources.io import TableIO

    spark.conf.set("spark.sql.catalog.it_lake", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it_lake.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it_lake.warehouse", str(tmp_path / "warehouse"))
    return TableIO(spark, mode="iceberg", catalog="it_lake")


def test_write_partitioned_bootstrap_and_overwrite(spark, iceberg_io):
    from pyspark.sql import functions as F

    df = spark.range(20).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") % 4).cast("int").alias("bucket"),
    )
    # first write must CREATE (partitionedBy only applies on create)
    iceberg_io.write_partitioned(df, "docs", partition_col="bucket")
    assert iceberg_io.read("docs").count() == 20

    # second write replaces exactly the partitions present in df
    df2 = spark.createDataFrame([("x", 0)], ["doc_id", "bucket"])
    iceberg_io.write_partitioned(df2, "docs", partition_col="bucket")
    got = iceberg_io.read("docs")
    assert got.where("bucket = 0").count() == 1
    assert got.where("bucket <> 0").count() == 15  # untouched partitions

    # lineage token is a real snapshot id and changes across commits
    assert iceberg_io.snapshot_id("docs") not in ("", "empty")


def test_merge_progress_upserts(spark, iceberg_io):
    base = spark.createDataFrame(
        [(0, "running"), (1, "done")], ["partition_id", "status"]
    )
    base.writeTo("it_lake.progress").create()
    updates = spark.createDataFrame(
        [(1, "done"), (2, "done")], ["partition_id", "status"]
    )
    iceberg_io.merge_progress(updates, table="progress")
    rows = {
        r["partition_id"]: r["status"]
        for r in spark.table("it_lake.progress").collect()
    }
    assert rows == {0: "running", 1: "done", 2: "done"}


def test_expire_snapshots_runs(spark, iceberg_io):
    from pyspark.sql import functions as F

    df = spark.range(5).select(
        F.col("id").cast("string").alias("doc_id"),
        F.lit(0).cast("int").alias("bucket"),
    )
    iceberg_io.write_partitioned(df, "exp_docs", partition_col="bucket")
    iceberg_io.write_partitioned(df, "exp_docs", partition_col="bucket")
    # cutoff is now-7d: nothing this young expires, but the CALL must
    # parse and execute (the round-1 bug was an epoch literal no-op)
    iceberg_io.expire_snapshots("exp_docs", older_than_days=7)
    assert iceberg_io.read("exp_docs").count() == 5
