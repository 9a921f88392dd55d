"""Custom stateful streaming operators via ``applyInPandasWithState``
(the brief's designated tool for operators Structured Streaming's
built-ins can't express).

``running_user_totals`` keeps a per-user (count, sum) accumulator
across micro-batches — the streaming form of the reference's
incremental per-entity bookkeeping (retry counters, per-file tag
sets). State lives in the state store, checkpointed, so totals
survive restarts; memory per key is O(1).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, s double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s = state.get
        else:
            n, s = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(s, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_seen_filter(tags_stream: DataFrame) -> DataFrame:
    """Streaming first-occurrence filter: emit a (file_name, tag) only
    the first time it is seen — the stateful-stream form of the
    reference's dedupe-vs-existing check (app.py:962-977). State per
    (file, tag) key is a single boolean."""

    def fn(key, pdfs, state: GroupState):
        already = state.exists
        state.update((True,))
        if not already:
            yield pd.DataFrame({"file_name": [key[0]], "tag": [key[1]]})
        else:
            yield pd.DataFrame({"file_name": [], "tag": []})

    return tags_stream.groupBy("file_name", "tag").applyInPandasWithState(
        fn,
        outputStructType="file_name string, tag string",
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT = "user_id long, session_start timestamp, session_end timestamp, n_events long"
SESSION_STATE = "start long, end long, n long"  # event-time micros + count

_GAP_MIN = 30


def session_close_emitter(events: DataFrame, gap_minutes: int = _GAP_MIN) -> DataFrame:
    """Emit-on-close sessionization — the pattern the built-in
    ``session_window`` aggregate can't express: a session row is
    emitted EXACTLY ONCE, either when a later event from the same user
    exceeds the gap (intra-batch close) or when the EVENT-TIME TIMEOUT
    fires because the watermark passed session_end + gap (no more
    on-time data can extend it). Downstream sees an append-only stream
    of finished sessions — the shape a training-data eventlog compactor
    wants to upsert.

    State per user is one (start, end, n) triple — O(1), evictable,
    checkpointed. Batch parity: over a fully-replayed log the emitted
    sessions equal the batch ``session_window`` aggregation
    (tests/test_streaming.py::test_session_close_emitter_*).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start * 1000)],
                    "session_end": [pd.Timestamp(end * 1000)],
                    "n_events": [n],
                }
            )
            return
        ts: list[int] = []
        for pdf in pdfs:
            # arrow hands timestamps as datetime64[ns]; keep micros
            ts.extend(int(v) // 1000 for v in pdf["ts"].astype("int64"))
        ts.sort()
        cur = state.get if state.exists else None
        closed: list[tuple[int, int, int]] = []
        for t in ts:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] <= gap_us:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
            else:
                closed.append(cur)
                cur = (t, t, 1)
        if cur is not None:
            state.update(cur)
            # the close deadline; never at/below the current watermark
            # (Spark rejects that), so a late-straggling session closes
            # on the next watermark advance instead
            deadline_ms = (cur[1] + gap_us) // 1000
            state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(s * 1000) for s, _, _ in closed],
                "session_end": [pd.Timestamp(e * 1000) for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            }
        )

    return events.withWatermark("ts", "1 minute").groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


GAPFILL_SCHEMA = "user_id long, day timestamp, n_events long, gap boolean, ff_value_cents long"
GAPFILL_STATE = "last_day_us long, last_cents long"


def daily_forward_fill(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``gapfill_daily`` query: per user,
    densify event days onto a daily grid and carry the last observed
    daily sum across empty days. State per user is TWO longs (last
    emitted day + last daily sum), so a user who goes quiet for a week
    gets the gap days emitted — forward-filled from state — the moment
    they reappear; memory is O(1) per key regardless of history.

    One availableNow batch over a static input emits exactly the
    batch query's rows (parity-tested); incremental batches resume
    the grid from the state's last day.

    Late data: append mode cannot retract an already-emitted day, so
    events at or below the state's last emitted day are DROPPED here
    (and, crucially, never regress the state — a late-only batch left
    the old version re-emitting the whole tail as duplicates). The
    batch twin replaying the full log is the corrective source of
    truth for late arrivals, the standard lambda split — implemented:
    ``queries.timeseries.gapfill_corrections`` recomputes the affected
    users from storage and ``merge_corrections`` overlays the stream
    output, parity-tested so stream + corrections == batch truth."""

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        user = key[0]
        pdf = pd.concat(list(pdfs))
        days = pdf["ts"].dt.floor("D")
        cents = np.floor(pdf["value"].astype("float64") * 100 + 0.5).astype("int64")
        daily = (
            pd.DataFrame({"day": days, "cents": cents})
            .groupby("day")["cents"]
            .agg(n_events="size", value_cents="sum")
        )
        if state.exists:
            last_day_us, last_cents = state.get
            last_day = pd.Timestamp(last_day_us, unit="us")
            daily = daily[daily.index > last_day]
            if daily.empty:
                return  # late-only batch: emit nothing, keep state monotone
            day = last_day + pd.Timedelta(days=1)
            cur = int(last_cents)
        else:
            day = daily.index.min()
            cur = None
        end = daily.index.max()
        rows = []
        while day <= end:
            if day in daily.index:
                n = int(daily.loc[day, "n_events"])
                cur = int(daily.loc[day, "value_cents"])
                gap = False
            else:
                n, gap = 0, True
            rows.append((user, day, n, gap, cur))
            day += pd.Timedelta(days=1)
        state.update((int(end.value // 1000), int(cur)))
        yield pd.DataFrame(
            rows, columns=["user_id", "day", "n_events", "gap", "ff_value_cents"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=GAPFILL_SCHEMA,
        stateStructType=GAPFILL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
