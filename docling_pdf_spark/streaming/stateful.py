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


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_sessions", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
    ]
)

# (epoch seconds of last event, session count, event count, value sum)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.DoubleType(), False),
        T.StructField("n_sessions", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
    ]
)

SESSION_GAP_SEC = 1800  # same 30-min inactivity gap as queries.q_sessionization


def _session_fn(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts", "event_id"], ignore_index=True
    )
    # WHOLE seconds (ns → floor), matching the batch query's
    # F.unix_timestamp truncation exactly — micro-precision gaps within
    # 1s of the threshold must classify identically in both forms
    t = (rows["ts"].astype("int64") // 10**9).astype("float64")
    prev = t.shift(1)
    if state.exists:
        last_ts, ns, ne, sv = state.get
        prev.iloc[0] = last_ts
    else:
        ns, ne, sv = 0, 0, 0.0
    new_session = prev.isna() | ((t - prev) > SESSION_GAP_SEC)
    ns += int(new_session.sum())
    ne += len(rows)
    sv += float(rows["value"].sum())
    state.update((float(t.iloc[-1]), ns, ne, sv))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [ns], "n_events": [ne], "sum_value": [sv]}
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Streaming gap-based sessionization (the incremental form of
    queries.q_sessionization's batch window): per-user running
    (n_sessions, n_events, sum_value), state = one 4-field row per user.
    A new session starts after >30 min of inactivity; the cross-batch
    boundary is carried in state as the last event's timestamp, so a
    session spanning two micro-batches is NOT double-counted.

    Emits current totals per user each micro-batch (update mode) — a
    fully drained stream's final row per user equals the batch query
    (pinned by test). Requires event-time-ordered arrival across
    micro-batches (file-source ordering here; use a watermark + event
    buffer for out-of-order sources)."""
    keyed = events.select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


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
