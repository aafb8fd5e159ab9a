"""Table IO layer: Iceberg catalog mode + partitioned-parquet fallback."""

from docling_pdf_spark.sources.io import TableIO  # noqa: F401
