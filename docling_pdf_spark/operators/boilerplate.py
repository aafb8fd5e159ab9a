"""Corpus-frequency line deduplication (boilerplate removal) — the
CCNet/RefinedWeb curation pass that strips lines repeated across many
DOCUMENTS (nav menus, cookie banners, footers, share buttons): a line
whose normalized form appears in >= min_docs distinct docs is
boilerplate and is removed from every doc it appears in (Wenzek et al.
2020 CCNet §4.1 dedups paragraphs by hash across shards; Penedo et al.
2023 RefinedWeb §3.1 line-wise filtering).

Scale shape (the whole point — per-doc logic cannot see cross-doc
repetition, so this is inherently a corpus-level operator):

  1. posexplode lines            — narrow, |lines| rows
  2. distinct (line_norm, doc)   — shuffle 1 (pre-aggregates map-side)
  3. count per line_norm         — shuffle 2 (tiny: one row per
     distinct line), filter >= min_docs → the boilerplate set,
     O(distinct frequent lines) — small enough that AQE broadcasts it
     back on its own at any realistic threshold
  4. join lines ⟕ boilerplate    — shuffle-or-broadcast (AQE decides;
     NO forced broadcast: at 100 TB with a low threshold the frequent
     set can be large)
  5. reassemble per doc          — one groupBy(doc): sort the (pos,
     line) structs array-side, concat_ws — byte-faithful round-trip
     (split('\\n') + concat_ws('\\n') is the identity on any text)

Whitespace-only/short lines (< min_line_chars after trim) are
structure, not content: they are excluded from counting AND from
removal, so paragraph breaks survive even though every doc "shares"
them. Matching is on lower(trim(line)); the ORIGINAL line text is what
gets reassembled.

Reference tie-in: corpus-level curation the single-file reference
cannot express (no corpus, pdf_extractor.py processes one upload);
part of the beyond-§2 training-data family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MIN_LINE_CHARS = 4


def _lines(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # coalesce: a NULL text must survive as one empty line on BOTH
    # engines (posexplode of NULL would silently drop the doc)
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "line"
        ),
    ).withColumn("line_norm", F.lower(F.trim(F.col("line"))))


def boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = DEFAULT_MIN_LINE_CHARS,
) -> DataFrame:
    """(line_norm, n_docs) for every normalized line appearing in at
    least `min_docs` DISTINCT documents — the observability companion
    (tune the threshold from data) and the shared kernel of the strip
    pass. Two shuffles, both with map-side partial aggregation."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    lines = _lines(docs, id_col, text_col)
    return (
        lines.where(F.length("line_norm") >= min_line_chars)
        .select("line_norm", id_col)
        .distinct()
        .groupBy("line_norm")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = DEFAULT_MIN_LINE_CHARS,
) -> DataFrame:
    """Remove every boilerplate line (>= min_docs distinct docs) from
    every document; returns (id_col, text_col, n_boilerplate_removed)
    with the text reassembled in original line order (docs with no
    boilerplate round-trip byte-identically)."""
    lines = _lines(docs, id_col, text_col)
    bl = boilerplate_lines(
        docs, min_docs, id_col, text_col, min_line_chars
    ).select("line_norm", F.lit(True).alias("_bl"))
    flagged = lines.join(bl, "line_norm", "left").withColumn(
        "_rm", F.coalesce(F.col("_bl"), F.lit(False))
    )
    arr = F.array_sort(F.collect_list(F.struct("pos", "line", "_rm")))
    return flagged.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.filter(arr, lambda x: ~x["_rm"]), lambda x: x["line"]
            ),
        ).alias(text_col),
        F.sum(F.col("_rm").cast("int")).alias("n_boilerplate_removed"),
    )


def strip_boilerplate_sql(
    table: str = "documents",
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = DEFAULT_MIN_LINE_CHARS,
) -> str:
    """DuckDB twin: identical normalization, DISTINCT-doc frequency,
    and ordered reassembly (string_agg ORDER BY position; coalesce('')
    matches concat_ws's empty-array result when every line of a doc is
    boilerplate)."""
    return f"""
WITH lines AS (
  SELECT {id_col}, u.pos, u.line, lower(trim(u.line)) AS line_norm
  FROM (
    SELECT {id_col},
           unnest(list_transform(
             string_split(coalesce({text_col}, ''), chr(10)),
             (x, i) -> {{'pos': i - 1, 'line': x}})) AS u
    FROM {table})
), bl AS (
  SELECT line_norm FROM lines
  WHERE length(line_norm) >= {min_line_chars}
  GROUP BY line_norm
  HAVING count(DISTINCT {id_col}) >= {min_docs}
)
SELECT l.{id_col},
       coalesce(
         string_agg(l.line, chr(10) ORDER BY l.pos)
           FILTER (WHERE b.line_norm IS NULL),
         '') AS {text_col},
       CAST(count(*) FILTER (WHERE b.line_norm IS NOT NULL) AS BIGINT)
         AS n_boilerplate_removed
FROM lines l LEFT JOIN bl b USING (line_norm)
GROUP BY l.{id_col}
"""
