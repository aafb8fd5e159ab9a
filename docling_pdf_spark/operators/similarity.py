"""Similarity search over an embedding column (array<float>).

Baseline: exact brute-force cosine top-k (queries.q_ann_cosine_topk is
the driver-checked variant). Scale path: IVF-style bucketing — assign
every vector to its nearest coarse centroid once (one shuffle), then
answer queries by scanning only the nprobe closest buckets. At 100 TB
the bucket assignment is the write-time partitioning of the vector
table, and a query touches nprobe partitions instead of all of them
(classic IVF-Flat from the FAISS/ANN literature).

Everything is JVM-side: dot products via zip_with + aggregate over
array<double>; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docling_pdf_spark.functions.vectors import dot as _dot
from docling_pdf_spark.functions.vectors import l2_norm as _norm


def cosine_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k: one scan, one narrow top-k sort."""
    v = F.col(vec_col).cast("array<double>")
    q = F.lit(query_vec).cast("array<double>")
    sim = _dot(v, q) / (_norm(v) * _norm(q))
    return (
        vectors.select(F.col(id_col), F.round(sim, 6).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine).

    centroids: (centroid_id, centroid) — small, broadcast. The argmax
    is a JVM-side array_max over a transformed centroid array after a
    broadcast crossJoin with the collected centroid list."""
    cent = centroids.select(
        F.array_agg(
            F.struct(
                F.col("centroid_id"), F.col("centroid").cast("array<double>").alias("c")
            )
        ).alias("cents")
    )
    v = F.col(vec_col).cast("array<double>")
    scored = vectors.crossJoin(F.broadcast(cent)).select(
        F.col(id_col),
        F.col(vec_col),
        F.array_max(
            F.transform(
                F.col("cents"),
                lambda s: F.struct(
                    (_dot(v, s["c"]) / (_norm(v) * _norm(s["c"]))).alias("sim"),
                    s["centroid_id"].alias("centroid_id"),
                ),
            )
        ).alias("best"),
    )
    return scored.select(
        id_col, vec_col, F.col("best.centroid_id").alias("bucket")
    )


def default_centroids(
    vectors: DataFrame, n: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic coarse centroids: the n lowest-id vectors (a real
    deployment would run k-means|| once at table-build time; the bucket
    mechanics downstream are identical)."""
    return (
        vectors.orderBy(F.asc(id_col))
        .limit(n)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid"))
    )


def ivf_cosine_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN query: rank centroids vs the query, scan only the nprobe
    best buckets (partition pruning at scale), exact top-k inside."""
    q = F.lit(query_vec).cast("array<double>")
    c = F.col("centroid").cast("array<double>")
    probe_ids = [
        r["centroid_id"]
        for r in centroids.select(
            "centroid_id", (_dot(c, q) / (_norm(c) * _norm(q))).alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc("centroid_id"))
        .limit(nprobe)
        .collect()
    ]
    v = F.col(vec_col).cast("array<double>")
    sim = _dot(v, q) / (_norm(v) * _norm(q))
    return (
        assigned.where(F.col("bucket").isin(probe_ids))
        .select(F.col(id_col), F.round(sim, 6).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
