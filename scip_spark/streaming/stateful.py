"""Custom stateful streaming operator via ``applyInPandasWithState``.

A running per-user profile (event count, value sum, last-seen ts) that
survives across micro-batches — the kind of arbitrary keyed state the
reference could not express at all (its pipeline is batch-only,
SURVEY §2.7). State is explicit, bounded per key, and updated
incrementally: at 100 TB of events the state store holds one small row
per user, not the stream.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].max().value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_seen": [pd.Timestamp(last_us * 1000)],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """events stream → continuously-updated per-user profile rows."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class UserProfileProcessor:
    """``transformWithStateInPandas`` twin of ``user_profiles`` — the
    Spark 4 successor API: named state handles (ValueState) with
    per-state TTL support instead of one opaque state tuple. Same
    semantics, same output schema; equality with the
    applyInPandasWithState path is asserted in tests.

    Environment note: the TWS state protocol speaks protobuf to the
    JVM; pyspark treats ``protobuf`` as an optional dependency and the
    test skips when ``google.protobuf`` is absent (this container).
    Requires the RocksDB state store provider."""

    def init(self, handle) -> None:
        self._profile = handle.getValueState("profile", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> "Iterator[pd.DataFrame]":
        (user_id,) = key
        if self._profile.exists():
            n, total, last_us = self._profile.get()
        else:
            n, total, last_us = 0, 0.0, 0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last_us = max(last_us, int(pdf["ts"].max().value // 1000))
        self._profile.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_seen": [pd.Timestamp(last_us * 1000)],
            }
        )

    def close(self) -> None:
        pass


def user_profiles_tws(events: DataFrame) -> DataFrame:
    """events stream → per-user profiles via transformWithStateInPandas."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _P(UserProfileProcessor, StatefulProcessor):
        pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_P(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


ATTR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("first_touch", T.StringType()),
        T.StructField("last_touch", T.StringType()),
    ]
)

ATTR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_touch", T.StringType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def _update_attribution(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming first/last-touch attribution: per-user state is TWO
    strings (the user's first-ever event type and the most recent
    type) — O(1) regardless of history length. Each purchase emits one
    attribution row with the state as of the preceding event.

    Rows inside a batch are sorted by (ts, event_id); across batches
    correctness relies on per-user event-time monotonicity of the
    source (an ordered log / kafka partition per user) — same contract
    as the batch window's ORDER BY."""
    first_touch, last_type = (state.get if state.exists else (None, None))
    out_ids, out_first, out_last = [], [], []
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        # a group's batch rows can arrive as several Arrow chunks in
        # arbitrary order — sort the UNION, not each chunk
        merged = pd.concat(chunks, ignore_index=True)
        for row in merged.sort_values(["ts", "event_id"]).itertuples():
            if row.event_type == "purchase" and last_type is not None:
                out_ids.append(int(row.event_id))
                out_first.append(first_touch)
                out_last.append(last_type)
            if first_touch is None:
                first_touch = row.event_type
            last_type = row.event_type
    state.update((first_touch, last_type))
    yield pd.DataFrame(
        {"event_id": out_ids, "first_touch": out_first, "last_touch": out_last}
    )


def attribution_stream(events: DataFrame) -> DataFrame:
    """events stream → one row per purchase with first/last-touch
    credit — the streaming twin of the batch
    ``attribution_touchpoints`` window query."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_attribution,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
