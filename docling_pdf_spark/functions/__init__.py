"""Reusable JVM-side column-expression library.

Everything here is built from pyspark.sql.functions primitives (no
UDFs), so any consumer stays inside whole-stage codegen. These are the
building blocks the query catalog (docling_pdf_spark.queries) and the
similarity/dedup operators compose.
"""

from docling_pdf_spark.functions.text import (  # noqa: F401
    digit_ratio,
    normalized_fingerprint,
    stopword_hits,
    token_count,
)
from docling_pdf_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
