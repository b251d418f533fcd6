"""Streaming transformation operators over delta streams: watermarked
windowed aggregation (late-data tolerant), watermarked stream dedup,
and gap-based sessionization as a custom stateful operator.

These are the declarative Structured Streaming layer between
`read_stream` (the delta source) and `write_stream` (the exactly-once
sink): readStream → transform → writeStream. Spark owns the hard parts
— state stores, watermark tracking, late-row dropping — we only
declare the plan:

- `windowed_rollup` / `streaming_dedup` are pure built-in compositions
  (`withWatermark` + `window()` / `dropDuplicates`): incremental
  per-key state, bounded by the watermark horizon; at 100 TB/day these
  shuffle only the per-trigger delta, never historical state.
- `sessionize_stream` is the custom-stateful-operator pattern
  (`applyInPandasWithState`, Arrow-batched): per-user session state
  with an event-time timeout; closed sessions emit exactly once, open
  sessions are carried in the state store. The batch equivalent (same
  gap semantics) is the `events_sessionize` gate query's lag-window
  SQL — the streaming path must converge to it for every session the
  watermark has closed (asserted in tests/test_streaming.py).

Reference parity: the reference ships no streaming transforms of its
own (its DeltaSource/DeltaSink feed stock Structured Streaming);
these operators document and test that path end-to-end over our
source/sink instead of leaving it implied.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampType)


def _as_event_time(stream: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (not TIMESTAMP_NTZ, which parquet
    columns arrive as); under the engine's UTC session default the cast
    is instant-preserving."""
    return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def windowed_rollup(stream: DataFrame, ts_col: str = "ts",
                    window: str = "1 hour", watermark: str = "2 hours",
                    group_cols: tuple[str, ...] = ("event_type",),
                    value_col: str = "value") -> DataFrame:
    """Tumbling-window count/sum with a watermark: rows later than
    `watermark` behind the max event time are dropped, so state is
    bounded and windows finalize (append-mode emittable)."""
    return (_as_event_time(stream, ts_col)
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window), *group_cols)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(value_col).alias("total"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    *group_cols, "n", "total"))


def streaming_dedup(stream: DataFrame, id_cols: tuple[str, ...] = ("event_id",),
                    ts_col: str = "ts", watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event admission: drop re-deliveries of the same id
    within the watermark horizon. `dropDuplicatesWithinWatermark` keys
    state on the ids ALONE (a retry restamped with a slightly different
    timestamp is still a duplicate) and expires it with the watermark —
    plain `dropDuplicates` on ids would grow state forever."""
    return (_as_event_time(stream, ts_col)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(id_cols)))


_SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

# open-session state: (start_us, last_us, n_events) — epoch MICROseconds
# so emitted session bounds are bit-identical to the source timestamps
_SESSION_STATE = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
])


def sessionize_stream(stream: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", gap_minutes: int = 30,
                      watermark: Optional[str] = None) -> DataFrame:
    """Gap-based sessionization as a stateful streaming operator
    (`applyInPandasWithState`, event-time timeout).

    Semantics match the batch lag-window definition: events for a user
    belong to one session while consecutive gaps are <= `gap_minutes`;
    a larger gap closes the session. A session row is emitted when it
    CLOSES — either a later event arrives past the gap, or the
    watermark passes session_end + gap (event-time timeout). Until
    then the open session lives in the state store: per-user state is
    three longs, so state size is O(active users), not O(events)."""
    gap_us = gap_minutes * 60 * 1_000_000
    wm = watermark or f"{2 * gap_minutes} minutes"

    def fn(key: tuple, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        (user,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [user],
                                "session_start": [pd.Timestamp(start_us, unit="us")],
                                "session_end": [pd.Timestamp(last_us, unit="us")],
                                "n_events": [n]})
            return

        ts = pd.concat([pdf[ts_col] for pdf in pdfs]).sort_values()
        # epoch-µs regardless of the incoming pandas datetime unit —
        # session bounds must round-trip the source timestamps exactly
        us = ts.astype("datetime64[us]").astype("int64").tolist()
        sessions = []  # closed (start, end, n)
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        # In-watermark late arrivals BEFORE the open session follow the
        # batch lag-window semantics exactly: chain among themselves by
        # the gap rule; the final chain joins the open session only if
        # it reaches within `gap` of its start, else it closes on its
        # own. Arrivals INSIDE the open span always merge — consecutive
        # open-session events are ≤ gap apart, so every interior point
        # is within gap of one of them.
        if start_us is not None:
            pre = [t for t in us if t < start_us]
            n += sum(1 for t in us if start_us <= t <= last_us)
            post = [t for t in us if t > last_us]
            if pre:
                cs = cl = pre[0]
                cn = 1
                for t in pre[1:]:
                    if t - cl > gap_us:
                        sessions.append((cs, cl, cn))
                        cs, cn = t, 0
                    cl = t
                    cn += 1
                if start_us - cl <= gap_us:
                    start_us, n = cs, n + cn  # chain joins the session
                else:
                    sessions.append((cs, cl, cn))
        else:
            post = us
        for t in post:
            if start_us is None:
                start_us = last_us = t
                n = 1
                continue
            if t - last_us > gap_us:
                sessions.append((start_us, last_us, n))
                start_us, n = t, 0
            last_us = t
            n += 1
        state.update((start_us, last_us, n))
        # close the open session when the watermark passes its gap; the
        # (millisecond) timeout must sit strictly past the watermark
        state.setTimeoutTimestamp(
            max((last_us + gap_us + 999) // 1000,
                state.getCurrentWatermarkMs() + 1))
        if sessions:
            yield pd.DataFrame({
                "user_id": [user] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                "n_events": [c for _, _, c in sessions]})

    return (_as_event_time(stream, ts_col)
            .withWatermark(ts_col, wm)
            .groupBy(user_col)
            .applyInPandasWithState(fn, _SESSION_OUT, _SESSION_STATE,
                                    "append", GroupStateTimeout.EventTimeTimeout))
