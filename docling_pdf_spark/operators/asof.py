"""As-of (nearest-timestamp) join — an operator Spark's DataFrame API
lacks, composed from existing ops per the driver mandate's preference
order (composition > pandas UDF > mapPartitions).

The union-and-window formulation (public technique, e.g. the Flink/
kdb+/pandas `merge_asof` literature): tag both sides, union them, and
run one `last(value, ignorenulls=True)` window per partition key
ordered by (ts, side) — right rows at equal ts sort BEFORE left rows,
so the match condition is `right.ts <= left.ts` (ASOF >= semantics).

Scale shape: exactly ONE shuffle on the partition key serves both the
window sort and the result; no range-join explosion, no per-key driver
loop. Skewed keys behave like any window partition (salt upstream if a
single key dominates). The right side is pre-deduplicated to one row
per (key, ts) so the result is deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """For every left row, attach `value_col` from the right row with
    the greatest `on` (timestamp) ≤ the left row's `on`, matching `by`
    keys (ASOF LEFT JOIN). Right side must be unique per (by, on) —
    pre-aggregate it if it isn't.

    Returns all left columns + `out_col` (default `value_col`)."""
    out_col = out_col or value_col
    lcols = left.columns
    vtype = right.schema[value_col].dataType
    # the carried payload is a STRUCT, not the bare value: last(...,
    # ignorenulls) must skip left-side padding rows (null struct) but
    # MUST NOT skip a matched right row whose value is genuinely NULL —
    # ASOF semantics return that NULL, not a staler non-null value
    tagged_l = left.withColumn("_side", F.lit(1)).withColumn(
        "_asof_v",
        F.lit(None).cast(f"struct<v:{vtype.simpleString()}>"),
    )
    tagged_r = right.select(
        by, on, F.struct(F.col(value_col).alias("v")).alias("_asof_v")
    ).withColumn("_side", F.lit(0))
    # align columns for the union: left keeps its payload, right rows
    # carry null payload (they exist only to feed the window)
    pad_r = tagged_r
    for c in lcols:
        if c not in (by, on):
            pad_r = pad_r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = tagged_l.select(*lcols, "_side", "_asof_v").unionByName(
        pad_r.select(*lcols, "_side", "_asof_v")
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn("_carry", F.last("_asof_v", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select(*lcols, F.col("_carry.v").alias(out_col))
    )
