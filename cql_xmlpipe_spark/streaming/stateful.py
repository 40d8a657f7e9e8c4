"""Custom stateful streaming operator via ``applyInPandasWithState``.

Demonstrates the arbitrary-state API the built-in windowed aggregates
can't express: a per-user running profile (event count, exact value sum,
last-seen timestamp, distinct event types) maintained across triggers and
emitted on every update.

State is one small dict per user — O(users) memory, partitioned by the
grouping key across executors, checkpointed by the engine. The value sum
accumulates in integer cents to stay order-independent and bit-exact vs
the batch oracle.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_cents", T.LongType()),
        T.StructField("last_seen_us", T.LongType()),
        T.StructField("n_event_types", T.IntegerType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_cents", T.LongType()),
        T.StructField("last_seen_us", T.LongType()),
        T.StructField("event_types", T.ArrayType(T.StringType())),
    ]
)


def _update_user(
    key: tuple[Any, ...], batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, cents, last_us, types = state.get
        types = set(types)
    else:
        n, cents, last_us, types = 0, None, 0, set()
    for pdf in batches:
        n += len(pdf)
        # per-ROW cents, then integer sum: order- and batching-independent
        # (summing doubles first would tie the result to trigger
        # boundaries). SQL SUM skips NULLs but returns NULL when every
        # input is NULL — so cents stays None until the first non-null
        # value, and dropna only skips rows once the sum exists.
        vals = pdf["value"].dropna()
        if len(vals):
            cents = (cents or 0) + int((vals * 100).round().astype("int64").sum())
        ts_us = (pdf["ts"].astype("int64") // 1000).max()
        last_us = max(last_us, int(ts_us))
        types.update(pdf["event_type"].dropna().tolist())
    state.update((n, cents, last_us, sorted(types)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value_cents": [cents],
            "last_seen_us": [last_us],
            "n_event_types": [len(types)],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running profile, updated each trigger (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
