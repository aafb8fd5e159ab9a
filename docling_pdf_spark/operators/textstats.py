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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_FREQ_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("freq", T.LongType(), False),
    ]
)


def page_stats(extracted: DataFrame) -> DataFrame:
    """Per-page word/char counts over an EXTRACTED_SCHEMA table.

    The reference computes per-page `word_count`/`character_count` only
    on its fallback path (docling-pdf pdf_extractor.py:527-533 — the
    docling path discards them, SURVEY.md §1.1 schema asymmetry). Here
    the stats are a relational consumer of the span encoding, so they
    exist for EVERY extraction_method: one posexplode over the text
    spans, pure JVM expressions, no Python stage.

    Reference semantics (round-2 ADVICE): page numbers are 1-based
    (pdf_extractor.py enumerate(..., 1) convention) and an empty page
    has 0 words — Python's ''.split() is [], but F.split('', '\\s+')
    is [''] (size 1), so the empty case needs an explicit guard."""
    s = F.col("s")
    return extracted.select(
        "doc_id",
        "extraction_method",
        F.posexplode(
            F.filter(F.coalesce(F.col("spans"), F.array()), lambda x: x["kind"] == "text")
        ).alias("page_idx", "s"),
    ).select(
        "doc_id",
        (F.col("page_idx") + 1).alias("page_number"),
        F.length(s["text"]).alias("page_chars"),
        F.when(F.length(F.trim(s["text"])) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(s["text"]), r"\s+")))
        .alias("page_words"),
        "extraction_method",
    )


def top_tokens_per_language(
    docs: DataFrame, k: int = 10, lang_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """(lang, rank, token, freq): the k most frequent whitespace tokens
    per language; ties broken lexicographically (deterministic).

    Two-level combine (the 100 TB shape — round-1 held a whole language
    in one pandas frame, which OOMs on the `en` group at corpus scale):
      1. JVM pre-aggregate: explode(split) → groupBy(lang, token).count()
         — partial+final hash agg with map-side combine, so the shuffle
         carries |distinct (lang, token)| rows, not |tokens|;
      2. grouped pandas top-k over the count table — the per-group
         payload is the language's vocabulary (Heaps' law: ~|corpus|^0.5),
         not its corpus. The pandas kernel is kept deliberately as the
         repo's grouped-map (applyInPandas) coverage; a pure-JVM window
         row_number would also work here.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        top = pdf.sort_values(["freq", "token"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "lang": top[lang_col].to_numpy(),
                "rank": range(1, len(top) + 1),
                "token": top["token"].to_numpy(),
                "freq": top["freq"].to_numpy(),
            }
        )

    counts = (
        docs.select(
            lang_col,
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
        )
        .where(F.col("token") != "")
        .groupBy(lang_col, "token")
        .agg(F.count("*").alias("freq"))
    )
    return counts.groupBy(lang_col).applyInPandas(kernel, schema=TOKEN_FREQ_SCHEMA)
