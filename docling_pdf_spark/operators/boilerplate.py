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


def strip_boilerplate_spans(
    docs: DataFrame,
    min_docs: int = 3,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    min_line_chars: int = DEFAULT_MIN_LINE_CHARS,
) -> DataFrame:
    """Span-aware variant over the EXTRACTED shape (§1.4 encoding):
    remove corpus-frequent lines from every text span's text, then
    rebuild the span array so the encoding invariants survive —

    * text spans keep their order but get fresh CUMULATIVE offsets
      (len + 1 per '\\n' joiner, exactly core/extract.py's assembly);
    * media spans link to a text block by that block's offset, so each
      media offset is REMAPPED old→new through the map the fold builds
      while walking the text spans (which precede media spans in the
      encoding); an unmatched link degrades to -1, same as extraction;
    * table/image spans (offset −1) pass through untouched.

    Adds `n_boilerplate_removed`. Docs with no frequent line take a
    fast path: the original spans column is returned untouched (no
    per-row fold), so the common case costs one left join. The fold is
    a single JVM F.aggregate — no Python, no extra shuffle.
    """
    span_lines = (
        docs.select(F.col(id_col), F.explode(spans_col).alias("s"))
        .where(F.col("s.kind") == "text")
        .select(
            F.col(id_col),
            F.explode(F.split(F.coalesce(F.col("s.text"), F.lit("")), "\n")).alias(
                "line"
            ),
        )
        .select(F.col(id_col), F.lower(F.trim("line")).alias("line_norm"))
        .where(F.length("line_norm") >= min_line_chars)
    )
    freq = (
        span_lines.distinct()
        .groupBy("line_norm")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("line_norm")
    )
    # per-doc removal sets are tiny (distinct boilerplate lines the doc
    # actually contains) — the join result, not the corpus, sizes them
    doc_bl = (
        span_lines.join(freq, "line_norm")
        .groupBy(id_col)
        .agg(F.collect_set("line_norm").alias("_bl"))
    )
    out = docs.join(doc_bl, id_col, "left")

    bl = F.col("_bl")

    def _is_bl(line):
        norm = F.lower(F.trim(line))
        return (F.length(norm) >= min_line_chars) & F.array_contains(bl, norm)

    def _clean(text):
        return F.array_join(
            F.filter(
                F.split(F.coalesce(text, F.lit("")), "\n"),
                lambda l: ~_is_bl(l),
            ),
            "\n",
        )

    span_t = "struct<kind:string,text:string,media_ref:string,offset:int>"
    acc_t = f"struct<run:int,map:array<struct<o:int,n:int>>,out:array<{span_t}>>"

    def _step(acc, s):
        cleaned = _clean(s["text"])
        new_text_span = F.struct(
            s["kind"].alias("kind"),
            cleaned.alias("text"),
            s["media_ref"].alias("media_ref"),
            acc["run"].alias("offset"),
        )
        text_case = F.struct(
            (acc["run"] + F.length(cleaned) + F.lit(1))
            .cast("int")
            .alias("run"),
            F.concat(
                acc["map"],
                F.array(
                    F.struct(
                        s["offset"].alias("o"), acc["run"].alias("n")
                    )
                ),
            ).alias("map"),
            F.concat(acc["out"], F.array(new_text_span)).alias("out"),
        )
        remapped = F.filter(acc["map"], lambda m: m["o"] == s["offset"])
        media_span = F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            F.coalesce(
                F.element_at(remapped, 1)["n"], F.lit(-1).cast("int")
            ).alias("offset"),
        )
        other_case = F.struct(
            acc["run"].alias("run"),
            acc["map"].alias("map"),
            F.concat(
                acc["out"],
                F.array(
                    F.when(s["kind"] == "media", media_span).otherwise(s)
                ),
            ).alias("out"),
        )
        # a text span whose every line was boilerplate is DROPPED, not
        # kept empty — core/extract.py's assembly never emits empty
        # text spans (empty pages are skipped) and spans_audit counts
        # them as violations; its old offset gets no map entry, so a
        # media span linking to it degrades to -1 exactly like
        # extraction's out-of-range link resolution
        return F.when(
            s["kind"] == "text",
            F.when(F.length(cleaned) == 0, acc).otherwise(text_case),
        ).otherwise(other_case)

    zero = F.struct(
        F.lit(0).cast("int").alias("run"),
        F.array().cast("array<struct<o:int,n:int>>").alias("map"),
        F.array().cast(f"array<{span_t}>").alias("out"),
    ).cast(acc_t)
    rebuilt = F.aggregate(
        F.coalesce(F.col(spans_col), F.array().cast(f"array<{span_t}>")),
        zero,
        _step,
        lambda acc: acc["out"],
    )
    n_removed = F.aggregate(
        F.coalesce(F.col(spans_col), F.array().cast(f"array<{span_t}>")),
        F.lit(0),
        lambda acc, s: acc
        + F.when(
            s["kind"] == "text",
            F.size(
                F.filter(
                    F.split(F.coalesce(s["text"], F.lit("")), "\n"), _is_bl
                )
            ),
        ).otherwise(F.lit(0)),
    )
    # count FIRST: it reads the original spans column, which the next
    # withColumn replaces with the rebuilt array
    return (
        out.withColumn(
            "n_boilerplate_removed",
            F.when(bl.isNull(), F.lit(0)).otherwise(n_removed),
        )
        .withColumn(
            spans_col,
            F.when(bl.isNull(), F.col(spans_col)).otherwise(rebuilt),
        )
        .drop("_bl")
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
