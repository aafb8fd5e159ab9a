"""Custom stateful streaming operator: cross-micro-batch exact dedup
via applyInPandasWithState (driver mandate: 'applyInPandasWithState for
custom stateful operators').

Use case (training-data pipeline): documents arrive continuously; emit
each distinct fingerprint exactly once across the whole stream — the
incremental analog of the batch hash-groupBy dedup
(docling_pdf_spark.queries.q_dedup_exact). State per fingerprint is a
single (seen_count) long, so state size is |distinct fingerprints| —
the same cardinality any streaming dedup must hold. At 10^12-doc scale
you shard this by fingerprint hash (the groupBy key already does) and
let RocksDB-backed state stores page it.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("first_seen_batch_rows", T.LongType(), True),
    ]
)

DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen_count", T.LongType(), False)])


def _dedup_fn(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    (seen,) = state.get if state.exists else (0,)
    if seen == 0 and len(rows):
        first = rows.iloc[0]
        yield pd.DataFrame(
            {
                "fingerprint": [key[0]],
                "doc_id": [first["doc_id"]],
                "first_seen_batch_rows": [len(rows)],
            }
        )
    state.update((seen + len(rows),))


def streaming_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming DataFrame of (doc_id, text, ...) → first arrival per
    normalized fingerprint, exactly once across all micro-batches.

    The fingerprint (JVM-side md5 of casefolded text) is the group key,
    so the stateful shuffle partitions by it — identical key layout to
    the batch dedup's hash aggregate."""
    from docling_pdf_spark.functions.text import normalized_fingerprint

    keyed = docs.select(
        normalized_fingerprint(text_col).alias("fingerprint"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",  # each fingerprint emits at most once, ever
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
