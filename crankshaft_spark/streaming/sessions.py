"""Custom stateful streaming operator: per-user event sessionization.

Demonstrates the ``applyInPandasWithState`` path for operators Structured
Streaming's built-in windowed aggregations cannot express: sessions are
gap-delimited (a new session starts after ``gap`` of inactivity), so the
state is the open session per user, carried across micro-batches and closed
either by a later event beyond the gap or by the event-time timeout when
the watermark passes.

State per key is O(1) (one open session tuple), so cluster state scales
with |active users|, not |events| — the applyInPandasWithState contract a
10^12-event stream needs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, closed_by string"
)
STATE_SCHEMA = "start long, last long, n int"


def sessionize(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """events (user_id, ts, ...) stream → closed sessions
    (user_id, session_start, session_end, n_events, closed_by).

    ``closed_by`` is 'gap' (a later event opened a new session) or
    'timeout' (watermark passed the open session's end + gap).

    NULL event times are filtered before the stateful operator — the
    same rule as sessionize_batch.  Without the filter a single NULL ts
    reaches the state function as NaT (int64-min microseconds), poisons
    the open session's boundaries, and the first emission raises
    OutOfBoundsDatetime, terminating the whole streaming query; the
    watermark late-filter does NOT drop NULL event times.
    """
    gap_us = gap_seconds * 1_000_000
    events = events.where(events["ts"].isNotNull())

    def fn(key, pdfs, state: GroupState):
        user = key[0]
        out = []
        if state.hasTimedOut:
            start, last, n = state.get
            out.append((user, start, last, n, "timeout"))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    pd.to_datetime(pdf["ts"]).astype("int64") // 1000
                )
            ts_us.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = ts_us[0], ts_us[0], 0
            # admitted-late events older than the open session's start:
            # chain them into their own gap-sessions; the final late chain
            # merges into the open session when it ends within the gap
            # (previously start never moved backwards, so late events were
            # silently folded in with wrong boundaries)
            lates = [t for t in ts_us if t < start]
            rest = [t for t in ts_us if t >= start]
            if lates:
                l_sessions = []
                l_start = l_last = lates[0]
                l_n = 0
                for t in lates:
                    if l_n > 0 and t - l_last > gap_us:
                        l_sessions.append((l_start, l_last, l_n))
                        l_start, l_n = t, 0
                    l_last = t
                    l_n += 1
                if start - l_last <= gap_us:
                    start = l_start
                    n += l_n
                else:
                    l_sessions.append((l_start, l_last, l_n))
                for s0, e0, c0 in l_sessions:
                    out.append((user, s0, e0, c0, "gap"))
            for t in rest:
                if n > 0 and t - last > gap_us:
                    out.append((user, start, last, n, "gap"))
                    start, n = t, 0
                last = max(last, t)
                n += 1
            state.update((start, last, n))
            state.setTimeoutTimestamp((last + gap_us) // 1000)
        ts = pd.to_datetime
        yield pd.DataFrame(
            [
                (u, ts(s, unit="us"), ts(e, unit="us"), c, why)
                for u, s, e, c, why in out
            ],
            columns=["user_id", "session_start", "session_end", "n_events",
                     "closed_by"],
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch form of the same gap-session rule → (user_id, session_start,
    session_end, n_events).

    Gaps-and-islands as pure window algebra: an event starts a new session
    iff it is the user's first or follows its predecessor by more than
    ``gap_seconds``; the running count of starts is the session index.
    This is the rule the streaming operator's state machine implements —
    the pytest asserts the two agree — and, being integer/timestamp
    algebra, it has an exact DuckDB oracle.  Per-user windows only: work
    is bounded by one user's events, never a global sort.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    events = events.where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts")
    # parquet NTZ timestamps: session tz is pinned UTC, so the cast is the
    # identity on the instant
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | (us - prev > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    sid = F.sum(is_new).over(w)
    return (
        events.select("user_id", "ts")
        .withColumn("_sid", sid)
        .groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("int").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def sessionize_batch_oracle_sql(events_sql: str, *,
                                gap_seconds: int = 1800) -> str:
    """DuckDB mirror of sessionize_batch (identical window algebra)."""
    gap_us = gap_seconds * 1_000_000
    return f"""
    WITH e AS (SELECT user_id, ts FROM ({events_sql}) WHERE ts IS NOT NULL),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sids AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts) AS sid
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS INT) AS n_events
    FROM sids GROUP BY user_id, sid"""
