"""Custom stateful streaming operator: per-user sessionization with
`applyInPandasWithState` — the escape hatch for stream semantics the
built-in windowed aggregations can't express (data-driven session
boundaries carried across micro-batches).

Per micro-batch and user, the handler merges the carried state (last
event time + session counter of the open session) with the batch's
events, emits every session seen so far this batch, and stores the
open tail back into state. Arrow moves the batches; the per-key pandas
work is O(events of that key in the batch).

At scale the shuffle is on the session key (user), state lives in the
state store (RocksDB in production), and skew = one hot user's events
in one task — the same contract as any keyed stateful op.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType)

from . import read_stream, run_available_now

SESSION_GAP_US = 1_800_000_000  # 30 min

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", LongType()),
    StructField("n_events", LongType()),
    StructField("start_us", LongType()),
    StructField("dur_us", LongType()),
])

#: The full open-session tail lives in state — start, last event time,
#: event count, and the session counter — so a session that continues
#: across micro-batches resumes with the correct start/n_events instead
#: of a None start (which would crash the final emit).
STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
    StructField("session_seq", LongType()),
])


def _sessionize_key(key, pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    ts = pd.concat([pdf["ts_us"] for pdf in pdfs]).sort_values().to_numpy()
    if len(ts) == 0:
        return
    if state.exists:
        cur_start, last_us, cur_n, seq = state.get
    else:
        cur_start, last_us, cur_n, seq = None, None, 0, 0
    # a carried-over open session was already emitted (with exactly
    # these values) by the batch that created it — only re-emit it if
    # this batch changes it
    emitted_as_is = state.exists

    out: list[tuple[int, int, int, int, int]] = []
    for t in ts:
        t = int(t)
        if last_us is None or t - last_us > SESSION_GAP_US:
            if cur_start is not None and not emitted_as_is:
                out.append((user_id, seq, cur_n, cur_start, last_us - cur_start))
            seq += 1
            cur_start, cur_n = t, 0
        cur_n += 1
        last_us = t
        emitted_as_is = False
    out.append((user_id, seq, cur_n, cur_start, last_us - cur_start))

    state.update((cur_start, last_us, cur_n, seq))
    yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def stream_sessionize(spark: SparkSession, events_path: str) -> DataFrame:
    """Stateful streaming sessionization over the events table; with a
    single availableNow batch the result equals the batch sessionizer
    (plans.analytics._events_sessions semantics)."""
    from ..sources.tables import with_event_time
    sdf = with_event_time(read_stream(spark, events_path))
    keyed = (sdf.selectExpr("user_id", "(ts_ns div 1000) AS ts_us")
                .groupBy("user_id"))
    agg = keyed.applyInPandasWithState(
        _sessionize_key, OUTPUT_SCHEMA, STATE_SCHEMA,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)
    from . import bounded_stream_width
    return run_available_now(agg, output_mode="update",
                             width=bounded_stream_width(spark, events_path))


# ------------------------------------------------ CUSUM drift alarm

CUSUM_K0 = 6_000      # per-event drift allowance, exact cents
CUSUM_H = 20_000      # alarm threshold, exact cents

ALERT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("s_cents", LongType()),
])

CUSUM_STATE = StructType([StructField("s", LongType())])


def _cusum_key(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    batch = pd.concat(list(pdfs))
    if len(batch) == 0:
        return
    batch = batch.sort_values(["ts_us", "event_id"])
    s = state.get[0] if state.exists else 0
    out: list[tuple[int, int, int]] = []
    for eid, x in zip(batch["event_id"], batch["x"]):
        s = max(0, s + int(x) - CUSUM_K0)
        if s > CUSUM_H:
            out.append((user_id, int(eid), s))
            s = 0                         # standard restart after alarm
    state.update((s,))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "event_id", "s_cents"])


def stream_cusum_alerts(spark: SparkSession, events_path: str) -> DataFrame:
    """CUSUM drift alarms as a CUSTOM STATEFUL streaming operator —
    the page-one sequential-change-detection statistic (Page 1954):
    per user, s ← max(0, s + x − k0); alarm and restart when s > h.
    The recurrence is inherently sequential (no window/aggregate form
    exists), which is exactly what `applyInPandasWithState` is for:
    s carries across micro-batches in the state store, alarms are
    per-event facts emitted exactly once (never revised — safe in
    update mode). x is exact CENTS, so every emitted s is an exact
    BIGINT and the oracle — a per-user recursive CTE running the
    same recurrence — hash-matches bit-for-bit: a custom stateful
    stream with a FULL value oracle, not a rows-only check.

    Ordering contract (same as `stream_sessionize`): events sort by
    (ts_us, event_id) within a batch and batches arrive in event-time
    order — the fixture layout; production fronts this with a
    watermarked sort or accepts detection jitter.

    Scale shape: one shuffle on user_id into per-key state (one int),
    Arrow-batched per-key work linear in the batch."""
    from ..sources.tables import with_event_time
    from . import bounded_stream_width
    sdf = with_event_time(read_stream(spark, events_path))
    keyed = (sdf.selectExpr(
                 "user_id", "(ts_ns div 1000) AS ts_us", "event_id",
                 "CAST(round(value * 100) AS BIGINT) AS x")
                .groupBy("user_id"))
    agg = keyed.applyInPandasWithState(
        _cusum_key, ALERT_SCHEMA, CUSUM_STATE,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)
    return run_available_now(agg, output_mode="update",
                             width=bounded_stream_width(spark, events_path))
