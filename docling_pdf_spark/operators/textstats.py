"""Grouped text analytics via applyInPandas (grouped-map pattern).

Per-group corpus statistics that need the whole group in one place —
the canonical applyInPandas shape (one shuffle on the group key, then a
vectorized pandas kernel per group). Used here for per-language top-k
token frequencies, the building block of n-gram language models and
corpus-drift dashboards in a training-data pipeline.

The ungrouped/text-level signals (token counts, quality ratios,
fingerprints, stopword voting) stay pure JVM expressions in
docling_pdf_spark.functions.text — Python is reserved for the
genuinely group-wise kernel.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

TOKEN_FREQ_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("freq", T.LongType(), False),
    ]
)


def top_tokens_per_language(
    docs: DataFrame, k: int = 10, lang_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """(lang, rank, token, freq): the k most frequent whitespace tokens
    per language; ties broken lexicographically (deterministic).

    Plan shape: one hash shuffle on lang → grouped pandas kernel. At
    corpus scale a two-level combine (pre-aggregate token counts per
    partition with explode+groupBy, then grouped top-k) bounds the
    group payload; this kernel is the per-group reducer either way."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        counts: Counter[str] = Counter()
        for text in pdf[text_col]:
            if text:
                counts.update(text.split())
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        lang = pdf[lang_col].iloc[0]
        return pd.DataFrame(
            {
                "lang": [lang] * len(top),
                "rank": range(1, len(top) + 1),
                "token": [t for t, _ in top],
                "freq": [f for _, f in top],
            }
        )

    return docs.select(lang_col, text_col).groupBy(lang_col).applyInPandas(
        kernel, schema=TOKEN_FREQ_SCHEMA
    )
