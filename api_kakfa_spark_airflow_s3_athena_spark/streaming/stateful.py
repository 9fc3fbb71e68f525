"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful processing at all (SURVEY.md §2d —
"Absent: ... stateful ops"); these are driver-mandated extensions
built on Spark's arbitrary-state API. State is per-group, Arrow-batched
and bounded by timeouts, so a 100 TB/day stream with millions of keys
holds only one small state row per key.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_stats", "sessionize_with_state"]

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


_SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

# Open session: bounds in epoch micros, money in integer cents (exact).
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)

_US_PER_MS = 1_000


def _session_closer(gap_seconds: int):
    """Build the per-group update function for a given session gap.

    Closure instead of a module global so different gaps can coexist;
    the function ships to executors by pickle like any Pandas UDF.
    """
    gap_us = gap_seconds * 1_000_000

    def _emit(key: Tuple[Any, ...], start_us: int, last_us: int, n: int, cents: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                # exact integer cents -> one correctly-rounded division,
                # bit-identical to DECIMAL-sum-then-cast in any engine
                "sum_value": [cents / 100.0],
            }
        )

    def update(
        key: Tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Watermark passed last_us + gap: the open session is closed.
            start_us, last_us, n, cents = state.get
            state.remove()
            yield _emit(key, start_us, last_us, n, cents)
            return

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            # defensive: an invocation with no rows and no timeout
            # (e.g. a spurious wake-up) must not disturb state —
            # pd.concat([]) would throw and kill the query
            if state.exists:
                open_sess = state.get
                state.update(tuple(open_sess))
                state.setTimeoutTimestamp(
                    open_sess[1] // _US_PER_MS + gap_seconds * 1000
                )
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        pdf = pdf.sort_values("ts", kind="stable")
        ts = pdf["ts"]
        if getattr(ts.dtype, "tz", None) is not None:
            ts = ts.dt.tz_localize(None)
        ts_us = ts.astype("datetime64[us]").astype("int64")
        cents_arr = (pdf["value"] * 100).round().astype("int64")

        open_sess = list(state.get) if state.exists else None
        for t, c in zip(ts_us.to_numpy(), cents_arr.to_numpy()):
            t = int(t)
            if open_sess is None:
                open_sess = [t, t, 1, int(c)]
            elif t - open_sess[1] <= gap_us:
                open_sess[1] = t
                open_sess[2] += 1
                open_sess[3] += int(c)
            else:
                yield _emit(key, *open_sess)
                open_sess = [t, t, 1, int(c)]

        state.update(tuple(open_sess))
        # Close by event time: fire once the watermark passes the gap.
        state.setTimeoutTimestamp(open_sess[1] // _US_PER_MS + gap_seconds * 1000)

    return update


def sessionize_with_state(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: Optional[str] = "1 minute",
) -> DataFrame:
    """Streaming sessionization with explicit state and custom timeout —
    the ``applyInPandasWithState`` generalization of ``session_window``
    (which cannot express per-session custom logic such as exact-cents
    money, emit-on-gap mid-batch, or irregular close rules).

    A session closes when the NEXT event of the same user arrives more
    than ``gap_seconds`` later (emitted immediately, inside the batch)
    or when the event-time watermark passes ``last_event + gap``
    (emitted by the timeout callback). State per user is one 4-field
    row — bounded regardless of stream length; Arrow moves each
    user-group as one batch.

    Output: one row per CLOSED session. The final open session of each
    user stays in state (in a bounded availableNow replay it is never
    force-flushed — by design: it is not known to be over).

    Pass ``watermark_delay=None`` when ``events`` already carries an
    event-time watermark (e.g. downstream of
    ``dropDuplicatesWithinWatermark`` in a multi-stateful-operator
    query): Spark disallows redefining the watermark mid-plan, and the
    timeout clock then runs off the upstream definition.
    """
    keyed = events.select("user_id", "ts", "value")
    if watermark_delay is not None:
        keyed = keyed.withWatermark("ts", watermark_delay)
    return (
        keyed.groupBy("user_id")
        .applyInPandasWithState(
            _session_closer(gap_seconds),
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
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
