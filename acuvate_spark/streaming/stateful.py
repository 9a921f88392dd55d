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
