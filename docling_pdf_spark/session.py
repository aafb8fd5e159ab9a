"""SparkSession factory with the pipeline's tuned confs (SURVEY.md §4).

Every conf here is cluster-safe; `master` is only forced when the
caller asks for a specific local parallelism (tests / bench two-size
scaling runs). On a real cluster the job is launched via
`spark-submit --py-files dist/docling_pdf_spark.zip jobs/extract.py`
and inherits the site master/executor settings.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from docling_pdf_spark.conf import ARROW_MAX_RECORDS_PER_BATCH, SHUFFLE_PARTITIONS


def _export_package_to_workers() -> None:
    """Make the package importable in executor Python workers.

    Local-mode equivalent of `spark-submit --py-files
    dist/docling_pdf_spark.zip` (SURVEY.md §4.4 launch recipe): the JVM
    inherits PYTHONPATH at launch and passes it to the python workers,
    so it must be set BEFORE getOrCreate()."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )


def get_spark(
    app_name: str = "docling-pdf-spark",
    local_cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    _export_package_to_workers()
    b = SparkSession.builder.appName(app_name)
    if local_cores is not None:
        b = b.master(f"local[{local_cores}]")
    confs = {
        # AQE: runtime re-plan, post-shuffle coalescing, skew-join split
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow-batched Python boundary (the only Python stage)
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(
            ARROW_MAX_RECORDS_PER_BATCH
        ),
        # idempotent per-partition re-writes on resume (SURVEY.md §4.3.2)
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or SHUFFLE_PARTITIONS),
        "spark.sql.session.timeZone": "UTC",
        # keep driver logs usable in CI
        "spark.ui.showConsoleProgress": "false",
    }
    for k, v in {**confs, **(extra_conf or {})}.items():
        b = b.config(k, v)
    return b.getOrCreate()
