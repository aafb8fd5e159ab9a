"""Streaming jobs: incremental extraction + watermarked windows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from docling_pdf_spark.pipeline import extract
from docling_pdf_spark.schemas import DOCUMENTS_SCHEMA


def extract_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental extraction over a file-source stream of documents.

    The extraction transform is stateless per row, so the batch
    pipeline function is reused verbatim; Structured Streaming's own
    checkpoint supersedes the batch manifest protocol here (exactly-
    once file sink). trigger(availableNow) = catch-up-then-stop, the
    streaming analog of the resumable batch job."""
    docs = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_dir)
    out = extract(docs)  # no explicit repartition: keep the stream stateless/narrow
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1h event-type counts with late-data watermark —
    streaming-safe aggregation (works identically on a batch DF)."""
    # watermarks require TIMESTAMP (LTZ); parquet files carry NTZ —
    # cast under the UTC session timezone (value-preserving)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
