"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (driver mandate).

The decode/resize/frame-sample kernels need codec libraries that are
NOT in this container, so the codec step is stubbed behind
``NotImplementedError`` — but everything Spark-side is real and
tested: the asset schema, the Arrow-batched UDF signature and batch
shape, the deterministic byte-level feature extractor (a 16-bin byte
histogram — genuinely computable on opaque bytes), and the
partitioning of assets by size class.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType(), True),  # image|audio|video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_hist", T.ArrayType(T.DoubleType()), True),  # 16 bins
        T.StructField("byte_entropy", T.DoubleType(), True),
    ]
)

HIST_BINS = 16


def decode_image(data: bytes) -> "np.ndarray":
    """STUB: real pixel decode needs an image codec (PIL/libjpeg) that
    is not installed in this container. The Spark plumbing around it
    (schema, batching, partitioning) is real and tested."""
    raise NotImplementedError("image codec not available in this environment")


def sample_video_frames(data: bytes, every_ms: int = 1000) -> list[bytes]:
    """STUB: real frame sampling needs ffmpeg/pyav (not installed)."""
    raise NotImplementedError("video codec not available in this environment")


def _feature_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over opaque bytes: vectorized
    numpy histogram + entropy per asset. This is the shape a real
    decode kernel plugs into (swap the histogram for decode_image +
    model features)."""
    for b in batches:
        out = []
        for ref, kind, data in zip(b["media_ref"], b["media_kind"], b["data"]):
            if data is None:
                out.append((ref, kind, 0, [0.0] * HIST_BINS, 0.0))
                continue
            arr = np.frombuffer(data, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=HIST_BINS).astype(np.float64)
            total = float(hist.sum()) or 1.0
            p = hist / total
            nz = p[p > 0]
            entropy = float(-(nz * np.log2(nz)).sum())
            out.append((ref, kind, int(arr.size), [round(x, 6) for x in p.tolist()],
                        round(entropy, 6)))
        yield pd.DataFrame(
            out, columns=["media_ref", "media_kind", "n_bytes", "byte_hist", "byte_entropy"]
        )


def media_features(assets: DataFrame) -> DataFrame:
    """assets (MEDIA_ASSET_SCHEMA) → per-asset byte features.

    Skew note: media payloads are far fatter than text rows — the same
    salted-repartition treatment as the extraction pipeline applies;
    here we repartition by a uniform hash of media_ref before the UDF."""
    n = assets.sparkSession.sparkContext.defaultParallelism * 2
    balanced = assets.repartition(n, F.xxhash64("media_ref"))
    return balanced.select("media_ref", "media_kind", "data").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA
    )


def link_media_to_documents(extracted: DataFrame, features: DataFrame) -> DataFrame:
    """Join extracted media/image spans to their asset features:
    explode the span array (JVM-side), equi-join on media_ref. The
    features side is the smaller at realistic ratios → broadcast."""
    media_spans = extracted.select(
        "doc_id",
        F.explode(
            F.filter(F.col("spans"), lambda s: s["media_ref"].isNotNull())
        ).alias("span"),
    ).select("doc_id", F.col("span.media_ref").alias("media_ref"),
             F.col("span.kind").alias("span_kind"))
    return media_spans.join(F.broadcast(features), "media_ref", "left")
