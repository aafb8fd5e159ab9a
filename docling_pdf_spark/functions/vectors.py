"""Vector column expressions over array<float|double> embeddings —
zip_with/aggregate compositions (JVM-side; the ANN operators and the
driver queries build on these)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(x: Column) -> Column:
    return F.sqrt(dot(x, x))


def cosine_similarity(x: Column, y: Column) -> Column:
    return dot(x, y) / (l2_norm(x) * l2_norm(y))
