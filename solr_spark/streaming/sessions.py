"""Sessionization: inactivity-gap event sessions, batch and streaming.

The custom-stateful-operator pattern the engine's streaming tier is built
on: the BATCH version is pure DataFrame algebra (lag + conditional cumsum —
one shuffle on user_id, window functions inside the partition); the
STREAMING version is the same semantics as an `applyInPandasWithState`
operator — per-user state (open session aggregates) carried across
micro-batches, closed sessions emitted in append mode.

Reference charter: Solr has no sessionizer; this is part of the
training-data/analytics operator family (SURVEY §"beyond the reference").
The state layout follows the Spark Structured Streaming programming-guide
pattern for arbitrary stateful ops (public API: DataFrame.groupBy(...)
.applyInPandasWithState).

Scale shape: batch = ONE hash shuffle on user_id, everything else inside
the partition; streaming = state store keyed by user_id (RocksDB-backed on
a real cluster), per-batch work proportional to arriving events, vectorized
pandas inside each group — no per-row Python in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
_STATE_SCHEMA = "last_ts timestamp, session_start timestamp, n int, total double"


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: per user, a new session starts when the gap
    since the previous event exceeds ``gap_minutes``. Returns one row per
    session: (user_id, session_start, session_end, n_events, total_value).
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.lit(gap_minutes * 60)
    prev = F.lag("ts").over(w)
    # double cast handles TIMESTAMP_NTZ sources (NTZ -> TIMESTAMP -> epoch)
    secs = lambda c: c.cast("timestamp").cast("long")  # noqa: E731
    new_session = F.when(
        prev.isNull() | (secs(F.col("ts")) - secs(prev) > gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    sid = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.select("user_id", "ts", "value", sid.alias("_sid"))
        .groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("int").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .drop("_sid")
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization over a streaming DataFrame with columns
    (user_id, ts, value): applyInPandasWithState keyed by user_id. State =
    the OPEN session's aggregates; a batch's events extend or close it.
    CLOSED sessions are emitted (append mode); the open tail stays in state
    until a later event closes it — so a session spanning micro-batches is
    stitched correctly, which is the point of the state store.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = pd.Timedelta(minutes=gap_minutes)

    def fn(key: tuple, pdf_iter, state: GroupState):
        events_pd = pd.concat(list(pdf_iter), ignore_index=True)
        if events_pd.empty:
            return
        events_pd = events_pd.sort_values("ts", kind="mergesort")
        ts = events_pd["ts"].reset_index(drop=True)
        val = events_pd["value"].reset_index(drop=True)

        if state.exists:
            last_ts, s_start, n, tot = state.get
        else:
            last_ts = s_start = None
            n, tot = 0, 0.0

        # vectorized session split within the batch; the carried-over open
        # session is stitched by seeding the first boundary check
        prev_ts = ts.shift(1)
        if last_ts is not None:
            prev_ts.iloc[0] = last_ts
        boundary = prev_ts.isna() | (ts - prev_ts > gap)
        sid = boundary.cumsum()  # 0 = continuation of the open session

        closed: list[tuple] = []
        if last_ts is not None and bool(boundary.iloc[0]):
            # the batch's first event starts a NEW session: the carried-over
            # open session is now closed — emit it, don't overwrite it
            closed.append((key[0], s_start, last_ts, n, tot))
            s_start = last_ts = None
            n, tot = 0, 0.0
        for s in sorted(sid.unique()):
            m = sid == s
            if s == 0 and s_start is not None:
                # a LATE event (older than the carried state) joins the open
                # session: take min/max so session bounds never run backwards
                c_start = min(s_start, ts[m].iloc[0])
                c_end = max(last_ts, ts[m].iloc[-1])
            else:
                c_start = ts[m].iloc[0]
                c_end = ts[m].iloc[-1]
            c_n = int(m.sum()) + (n if s == 0 else 0)
            c_tot = float(val[m].sum()) + (tot if s == 0 else 0.0)
            if s < sid.max():
                closed.append((key[0], c_start, c_end, c_n, c_tot))
            else:
                # the last group never closes here — it becomes (or extends)
                # the open session carried to the next micro-batch
                s_start, n, tot, last_ts = c_start, c_n, c_tot, c_end
        state.update((last_ts, s_start, n, tot))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end",
                         "n_events", "total_value"],
            )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.NoTimeout,
        )
    )
