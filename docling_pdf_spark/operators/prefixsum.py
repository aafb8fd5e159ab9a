"""Shared distributed prefix-sum scaffolding — the bucket/offset
kernel under `mixer.fill_to_allocation` (per-stratum token cumsums)
and `shuffle.global_row_number` (global dense ranks).

The pattern: range-repartition the rows on the total order, tag each
row with its RANGE partition id (`_bucket` — ascending with the
order), aggregate one tiny row per (partition-cols, bucket), convert
those to exclusive cumulative offsets with a window bounded by the
bucket count, and broadcast the offsets back. A within-bucket window
(bounded per bucket) then completes the exact global cumsum/rank with
no corpus-wide single-task sort.

THE MATERIALIZE INVARIANT (correctness-critical, review-found on the
mixer): the offsets branch and the per-row branch both consume the
bucketed rows, forking the lineage ABOVE the range exchange. On
shuffle-rooted input (a join/aggregate upstream) the two branches
would re-evaluate the exchange independently, and a nondeterministic
upstream (shuffle fetch order, AQE partition coalescing) can make the
two RangePartitioners sample DIFFERENT boundaries — disagreeing
`_bucket` ids silently corrupt every downstream prefix sum. So by
default the bucketed rows are localCheckpointed (lazily): both
branches then read ONE materialized bucket assignment, and a lost
checkpoint block fails LOUDLY instead of diverging silently. Pass
materialize=False only for deterministically re-computable input (a
parquet scan, an already-persisted frame), where both evaluations
provably sample identical boundaries (same per-input-partition
deterministic sample seed, same key columns, same scan splits) — that
skips the one-pass materialization cost and lets the second branch be
column-pruned. Any future change to this invariant applies to BOTH
call sites by construction — that is why this module exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKET_COL = "_bucket"


def bucketize_by_range(
    df: DataFrame,
    keys: list[Column],
    n_buckets: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Range-repartition on `keys` (a deterministic TOTAL order) and
    tag rows with their range-partition id as `_bucket`. See the
    module docstring for the `materialize` contract."""
    nb = n_buckets or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(nb, *keys)
    # spark_partition_id is nondeterministic-tagged, so Catalyst keeps
    # this projection pinned below any later window's exchange —
    # bucket ids are the RANGE partition ids, ascending with the order
    bucketed = ranged.withColumn(BUCKET_COL, F.spark_partition_id())
    if materialize:
        # freeze the bucket assignment once (blocks live on executors;
        # Spark's ContextCleaner reclaims them when unreferenced)
        bucketed = bucketed.localCheckpoint(eager=False)
    return bucketed


def bucket_offsets(
    bucketed: DataFrame,
    value: Column,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Exclusive cumulative sums of `value` per (partition_cols,
    bucket): `(partition_cols..., _bucket, _offset)` where `_offset`
    is the total of all EARLIER buckets in the same partition group.
    One tiny row per occupied bucket — broadcast it back. The window
    is bounded by the bucket count (and SinglePartition only when
    `partition_cols` is empty — still <= n_buckets rows)."""
    pcols = list(partition_cols or [])
    sums = bucketed.groupBy(*pcols, BUCKET_COL).agg(value.alias("_bsum"))
    woff = (
        Window.partitionBy(*pcols)
        .orderBy(BUCKET_COL)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sums.select(
        *pcols,
        BUCKET_COL,
        F.coalesce(F.sum("_bsum").over(woff), F.lit(0)).alias("_offset"),
    )
