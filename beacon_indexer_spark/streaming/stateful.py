"""Custom stateful streaming operator: session windows via
``applyInPandasWithState``.

The reference has no stateful streaming (SURVEY §2.12 — "no session
windows, no stateful aggregation"), but a training-data event pipeline
needs them; this is the Spark-native custom-stateful-operator pattern:
per-key state (open session) carried across micro-batches by the state
store, Arrow-batched user logic, checkpoint-backed exactly-once.

Semantics: events for a user belong to one session while consecutive
gaps are ≤ ``gap_s``; a longer gap closes the session (emitted) and opens
a new one. Open sessions persist in state across batches; they close when
a later batch brings a post-gap event (or on state timeout when running
with a processing-time trigger).

Scale notes: state is O(active keys) × 3 longs; the shuffle is the
groupBy(user) exchange that any sessionization needs. Skewed users are
bounded by the per-batch event count, not history — only (start, last, n)
is retained.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
# epoch-second state: (session_start, last_event, n_events)
SESSION_STATE_SCHEMA = "start long, last long, n long"


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming dedup: emit the first arrival of each key and
    drop re-deliveries (re-fetches, at-least-once sources) arriving within
    the watermark horizon. State is bounded by the watermark — Spark
    expires a key's dedup state once event time passes `ts + watermark`,
    so a key seen again AFTER the horizon re-emits (by design: for
    re-org-scale lateness the lake's latest-wins read is the backstop,
    SURVEY §2.12 late-dup handling).

    This is the Spark-native `dropDuplicatesWithinWatermark` — bounded
    state, exactly-once effect per horizon — versus the batch path's
    structural dedup (append everything, collapse at read time). Use this
    in front of an append sink that is NOT read through `latest()`.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    idle_timeout: bool = False,
) -> DataFrame:
    """Streaming DataFrame(user, ts, …) → closed sessions
    (user_id, session_start, session_end, n_events).

    ``idle_timeout=True`` arms a processing-time state timeout of ``gap_s``
    so a key whose events stop arriving still flushes its open session
    (requires a processing-time trigger — availableNow/one-shot runs never
    fire timeouts, which is why the default leaves it off and open sessions
    close only on a later post-gap event)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        start: Any
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0

        closed: list[tuple[int, int, int, int]] = []
        stamps: list[int] = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col])
            stamps.extend(int(v.timestamp()) for v in ts)

        for t in sorted(stamps):
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_s:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1

        if state.hasTimedOut:
            if start is not None:
                closed.append((user_id, start, last, n))
            state.remove()
        else:
            state.update((start, last, n))
            if idle_timeout:
                state.setTimeoutDuration(gap_s * 1000)

        yield pd.DataFrame(
            [
                (u, pd.Timestamp(s, unit="s"), pd.Timestamp(e, unit="s"), c)
                for u, s, e, c in closed
            ],
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    return (
        events.select(F.col(user_col).cast("long").alias(user_col), ts_col)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout,
        )
    )


HOLT_OUTPUT_SCHEMA = (
    "series string, n_seen long, level double, trend double,"
    " forecast_1 double"
)
# quantized Holt state: (level, trend, observations seen)
HOLT_STATE_SCHEMA = "l double, b double, i long"


def holt_stream(
    buckets: DataFrame,
    key_col: str = "series",
    bucket_col: str = "bucket",
    value_col: str = "value",
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Streaming Holt linear smoothing: per series key, the quantized
    (level, trend) recursion carried ACROSS micro-batches by the state
    store — the streaming twin of the batch
    `events_hourly_holt_forecast` fold, and byte-identical to it on the
    same bucket sequence (asserted by
    tests/test_stateful_stream.py::test_holt_stream_matches_batch_fold).

    Input rows are pre-bucketed (bucket, value) observations; within a
    batch they fold in bucket order, and state is three numbers per
    series — O(active series), independent of history length. Each
    batch emits the series' updated level/trend and one-step forecast.
    """

    def q9(x: float) -> float:
        import math

        return (
            math.floor(x * 1e9 + 0.5) / 1e9
            if x >= 0
            else -math.floor(-x * 1e9 + 0.5) / 1e9
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        series = str(key[0])
        if state.exists:
            lvl, trd, i = state.get
        else:
            lvl, trd, i = 0.0, 0.0, 0

        obs: list[tuple] = []
        for pdf in pdfs:
            obs.extend(
                (r[bucket_col], float(r[value_col]))
                for _, r in pdf.iterrows()
            )
        for _, v in sorted(obs, key=lambda t: t[0]):
            if i == 0:
                lvl, trd = v, 0.0
            elif i == 1:
                trd = q9(v - lvl)
                lvl = v
            else:
                nl = q9(alpha * v + (1.0 - alpha) * (lvl + trd))
                trd = q9(beta * (nl - lvl) + (1.0 - beta) * trd)
                lvl = nl
            i += 1
        state.update((lvl, trd, i))
        yield pd.DataFrame(
            [(series, i, lvl, trd, lvl + trd)],
            columns=["series", "n_seen", "level", "trend", "forecast_1"],
        )

    return (
        buckets.select(
            F.col(key_col).cast("string").alias(key_col),
            bucket_col,
            value_col,
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            HOLT_OUTPUT_SCHEMA,
            HOLT_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
