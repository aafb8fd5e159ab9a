"""Repetition-based quality filters — the Gopher-style signals
(Rae et al. 2021, "Scaling Language Models: ... Gopher", appendix A
MassiveText filtering; also used by RefinedWeb/FineWeb) that flag
boilerplate-heavy or degenerate documents by how much of them is
self-repetition:

* duplicate-line fraction        — lines occurring 2+ times / lines
* duplicate-paragraph fraction   — same over blank-line paragraphs
* top-bigram fraction            — share of all word-bigram slots taken
                                   by the single most frequent bigram

All three are pure JVM DataFrame ops: explode → two-level hash
aggregation (partial+final, map-side combine) → one shuffle on the
doc id per signal family. No Python, no UDFs — at 100 TB the cost is
the same explode/agg shape as the n-gram dedup pass, and the final
join of the three signal tables is co-partitioned on the id hash.

The thresholds used by published pipelines (dup-line > 0.30,
dup-paragraph > 0.30, top-2-gram > 0.20 → drop) are exposed as
defaults on the curate gate, not baked in here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dup_fraction(
    docs: DataFrame, id_col: str, unit: F.Column, out: str
) -> DataFrame:
    """fraction of unit-instances (lines / paragraphs) that belong to a
    unit-value occurring 2+ times within the doc. Empty/whitespace
    units are not counted on either side."""
    units = docs.select(
        F.col(id_col), F.explode(unit).alias("u")
    ).where(F.trim(F.col("u")) != "")
    per_value = units.groupBy(id_col, "u").agg(F.count("*").alias("c"))
    return per_value.groupBy(id_col).agg(
        (
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c")
        ).alias(out)
    )


ALL_SIGNALS = ("dup_line_frac", "dup_para_frac", "top_bigram_frac")


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    signals: tuple[str, ...] = ALL_SIGNALS,
) -> DataFrame:
    """(id, <signals...>) per doc — pass `signals` to compute only the
    gates actually thresholded (the bigram pass is the most expensive
    of the three; a caller gating on dup-line alone shouldn't pay it).

    Documents with no qualifying units (no non-blank line, fewer than
    two tokens) get 0.0 for the corresponding signal — "nothing
    repeats in nothing", and a degenerate doc should be caught by the
    length gates, not by a NULL leaking through a threshold predicate.
    """
    unknown = set(signals) - set(ALL_SIGNALS)
    if unknown or not signals:
        raise ValueError(f"signals must be a non-empty subset of {ALL_SIGNALS}")
    c = F.col(text_col)
    parts: list[DataFrame] = []
    if "dup_line_frac" in signals:
        parts.append(_dup_fraction(docs, id_col, F.split(c, r"\n"), "dup_line_frac"))
    if "dup_para_frac" in signals:
        parts.append(
            _dup_fraction(docs, id_col, F.split(c, r"\n{2,}"), "dup_para_frac")
        )
    if "top_bigram_frac" in signals:
        # adjacent pairs formed ARRAY-SIDE (zip of the token array with
        # its own tail) — one explode + one groupBy per doc id; a
        # (doc, pos)=(doc, pos+1) self-join would shuffle the exploded
        # token stream twice more (review-found)
        arr = F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")
        a = F.col("_arr")
        grams = (
            docs.select(F.col(id_col), arr.alias("_arr"))
            .where(F.size(a) >= 2)  # slice length must be >= 0
            .select(
                F.col(id_col),
                F.explode(
                    F.zip_with(
                        F.slice(a, 1, F.size(a) - 1),
                        F.slice(a, 2, F.size(a) - 1),
                        lambda x, y: F.concat_ws(" ", x, y),
                    )
                ).alias("g"),
            )
        )
        parts.append(
            grams.groupBy(id_col, "g")
            .agg(F.count("*").alias("c"))
            .groupBy(id_col)
            .agg((F.max("c") / F.sum("c")).alias("top_bigram_frac"))
        )
    out = docs.select(id_col)
    for p in parts:
        out = out.join(p, id_col, "left")
    ordered = [s for s in ALL_SIGNALS if s in signals]
    return out.select(
        id_col,
        *[
            F.round(F.coalesce(F.col(n), F.lit(0.0)), 6).alias(n)
            for n in ordered
        ],
    )


def repetition_stats_sql(table: str = "documents") -> str:
    """DuckDB SQL twin of repetition_stats (pytest-level exactness
    check — the driver registry sits at its 50-entry cap, so this
    operator's oracle lives in tests/test_quality.py instead)."""
    return f"""
WITH lines AS (
  SELECT doc_id, u, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split_regex(text, '\\n')) AS u FROM {table})
  WHERE trim(u) <> '' GROUP BY doc_id, u
), lf AS (
  SELECT doc_id, SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) * 1.0 / SUM(c) AS dup_line_frac
  FROM lines GROUP BY doc_id
), paras AS (
  SELECT doc_id, u, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split_regex(text, '\\n{{2,}}')) AS u FROM {table})
  WHERE trim(u) <> '' GROUP BY doc_id, u
), pf AS (
  SELECT doc_id, SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) * 1.0 / SUM(c) AS dup_para_frac
  FROM paras GROUP BY doc_id
), toks AS (
  -- ordinality over the FILTERED token list, matching the Spark side's
  -- zip of the filtered array with its own tail
  SELECT doc_id, w, ord
  FROM (SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> x <> '') AS l
        FROM {table}),
       LATERAL (SELECT unnest(l) AS w, generate_subscripts(l, 1) AS ord) t
), grams AS (
  SELECT a.doc_id, a.w || ' ' || b.w AS g, count(*) AS c
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
  GROUP BY a.doc_id, g
), tf AS (
  SELECT doc_id, MAX(c) * 1.0 / SUM(c) AS top_bigram_frac FROM grams GROUP BY doc_id
)
SELECT d.doc_id,
       round(coalesce(lf.dup_line_frac, 0.0), 6) AS dup_line_frac,
       round(coalesce(pf.dup_para_frac, 0.0), 6) AS dup_para_frac,
       round(coalesce(tf.top_bigram_frac, 0.0), 6) AS top_bigram_frac
FROM {table} d
LEFT JOIN lf USING (doc_id)
LEFT JOIN pf USING (doc_id)
LEFT JOIN tf USING (doc_id)
"""
