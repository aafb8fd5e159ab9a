"""The distributed extraction pipeline (SURVEY.md §4.4 physical sketch):

    scan documents (pruned by resume bucket filter)
      → salted repartition on (cost_bucket, salt)     # skew-taming shuffle
      → mapInPandas(extract_iter)                     # ONLY Python stage
      → write documents_extracted partitioned by bucket (idempotent)
      → per-bucket metrics agg → _progress manifest commit

Spark-first notes:
  * All pre/post-UDF expressions are built-in pyspark.sql.functions
    (JVM, whole-stage codegen): payload-cost estimation uses
    F.aggregate over the spans array, never Python.
  * The skew story (north_star "explicit salted repartitioning to tame
    skew from oversized PDFs"): scan order would otherwise cluster the
    oversized cohort into the tasks that read their row groups. We
    repartition on a uniform salt derived from xxhash64(doc_id), with
    heavyweight docs (payload ≥ OVERSIZE_COST_BUCKET_BYTES) spread
    round-robin so no two giants must share a task; Arrow batches are
    additionally re-chunked by cumulative payload bytes inside the UDF
    so one giant can't blow a batch (analog of the reference's 50 MB
    admission cap world, docling-pdf config.py:20).
  * Errors are rows (pdf_extractor.py:357-369) — a poisoned doc never
    kills a task, so speculative re-execution stays safe.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_pdf_spark.checkpoint import BucketManifest, ProgressLog
from docling_pdf_spark.conf import OVERSIZE_COST_BUCKET_BYTES, SALT_BUCKETS
from docling_pdf_spark.core.batch import extract_pdf_batch
from docling_pdf_spark.schemas import EXTRACTED_SCHEMA

MAX_BATCH_PAYLOAD_BYTES = 8 * 1024 * 1024  # re-chunk bound inside the UDF


def _cost_expr():
    """Payload bytes per doc, computed JVM-side over the spans array
    (whole-stage codegen; no Python touches this)."""
    return F.aggregate(
        F.coalesce(F.col("spans"), F.array()),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)).cast("long"),
    )


def with_cost(df: DataFrame) -> DataFrame:
    return df.withColumn("_cost_bytes", _cost_expr())


def salted_repartition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Explicit skew-taming shuffle (SURVEY.md §4.3.1).

    Light docs: uniform hash salt over doc_id. Heavy docs (oversized
    cohort): a distinct per-doc salt stream so they scatter one-per-task
    instead of landing wherever the scan found them.
    """
    df = with_cost(df)
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(num_partitions * SALT_BUCKETS))
    heavy_salt = F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(num_partitions))
    df = df.withColumn(
        "_salt",
        F.when(F.col("_cost_bytes") >= OVERSIZE_COST_BUCKET_BYTES, heavy_salt)
        .otherwise(salt),
    )
    return df.repartition(num_partitions, "_salt")


def _chunked_extract(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: re-chunk each Arrow batch so cumulative payload
    stays under MAX_BATCH_PAYLOAD_BYTES, then run the shared semantics."""
    for batch in batches:
        if not len(batch):
            continue
        if "_cost_bytes" in batch.columns:
            cost = batch["_cost_bytes"].fillna(0)
        else:
            cost = batch["spans"].map(
                lambda ss: 0
                if ss is None
                else sum(len(s.get("text") or "") for s in list(ss))
            )
        start = 0
        run = 0
        for i, c in enumerate(cost.tolist()):
            run += int(c)
            if run >= MAX_BATCH_PAYLOAD_BYTES and i > start:
                yield extract_pdf_batch(batch.iloc[start:i])
                start, run = i, int(c)
        if start < len(batch):
            yield extract_pdf_batch(batch.iloc[start:])


def extract(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """documents → documents_extracted as a lazy DataFrame transform."""
    if num_partitions:
        df = salted_repartition(df, num_partitions)
    cols = ["doc_id", "spans"]
    if "_cost_bytes" in df.columns:
        cols.append("_cost_bytes")
    return df.select(*cols).mapInPandas(_chunked_extract, schema=EXTRACTED_SCHEMA)


# --------------------------------------------------------------------------
# checkpointed job (resume / lineage / metrics) — SURVEY.md §4.3.2
# --------------------------------------------------------------------------


def run_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    n_buckets: int = 16,
    num_partitions: int | None = None,
    buckets_per_commit: int | None = None,
    input_snapshot: str | None = None,
    fail_after_commits: int | None = None,
) -> ProgressLog:
    """Checkpointed batch extraction with per-bucket resume.

    The unit of progress is a deterministic doc_id hash bucket (NOT a
    Spark partition id, which is plan-dependent). Completed buckets are
    skipped on re-run; bucket output directories are overwritten
    atomically via dynamic partition overwrite, so a re-run after a
    mid-job kill is idempotent (no dup/missing doc_ids).

    fail_after_commits: test hook — raise after N commit groups to
    simulate a mid-job crash (kill-and-resume test, SURVEY.md §5.2.4).
    """
    log = ProgressLog(checkpoint_dir)
    done = log.done_buckets()

    docs = spark.read.parquet(input_path)
    docs = docs.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)))
    pending = [b for b in range(n_buckets) if b not in done]
    if not pending:
        return log

    snapshot = input_snapshot or input_path
    group_size = buckets_per_commit or len(pending)
    groups = [pending[i : i + group_size] for i in range(0, len(pending), group_size)]

    for gi, group in enumerate(groups):
        started = _utcnow_iso(spark)
        sub = docs.where(F.col("bucket").isin([int(b) for b in group]))
        out = extract(sub.drop("bucket"), num_partitions=num_partitions)
        out = out.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
        )
        # dynamic partition overwrite → only this group's bucket dirs replaced
        out.write.partitionBy("bucket").mode("overwrite").parquet(output_path)

        # metrics from the committed output (no recompute of the UDF stage)
        stats = (
            spark.read.parquet(output_path)
            .where(F.col("bucket").isin([int(b) for b in group]))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.col("extraction_successful").cast("long")).alias("n_ok"),
                F.sum(F.col("n_chars")).alias("chars"),
                F.sum(F.col("n_words")).alias("words"),
                F.sum(F.col("n_pages").cast("long")).alias("pages"),
            )
            .collect()
        )
        finished = _utcnow_iso(spark)
        by_bucket = {r["bucket"]: r for r in stats}
        for b in group:
            r = by_bucket.get(b)
            n_docs = int(r["n_docs"]) if r else 0
            n_ok = int(r["n_ok"]) if r else 0
            log.commit(
                BucketManifest(
                    partition_id=int(b),
                    status="done",
                    n_docs=n_docs,
                    n_ok=n_ok,
                    n_failed=n_docs - n_ok,
                    metrics={
                        "chars": int(r["chars"]) if r else 0,
                        "words": int(r["words"]) if r else 0,
                        "pages": int(r["pages"]) if r else 0,
                    },
                    lineage={
                        "input_snapshot": snapshot,
                        "partition_key": f"bucket={b}",
                    },
                    started_at=started,
                    finished_at=finished,
                )
            )
        if fail_after_commits is not None and gi + 1 >= fail_after_commits:
            raise RuntimeError(f"injected failure after {gi + 1} commit group(s)")
    return log


def _utcnow_iso(spark: SparkSession) -> str:
    """Real timestamps (deliberate improvement over the reference's
    always-null created_at/completed_at, redis_manager.py:57,122)."""
    import datetime

    return datetime.datetime.now(datetime.timezone.utc).isoformat()
