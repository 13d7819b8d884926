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


# ---------------------------------------------------------------------------
# streaming bot-burst detection (twin of the batch ``bot_burst_users``
# range-frame query): per-user max event count in any rolling 60 s window
# ---------------------------------------------------------------------------

BURST_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("max_burst", T.LongType()),
        T.StructField("flagged", T.BooleanType()),
    ]
)

#: per-user state: event counts per epoch-second inside the watermark
#: horizon, plus the running burst maximum. Bounded: ≤ 60 s of seconds
#: per user once the watermark advances (plus the allowed lateness).
BURST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("secs", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("max_burst", T.LongType()),
    ]
)

BURST_WINDOW_S = 60
BURST_THRESHOLD = 5


def _update_burst(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Merge the batch's per-second event counts into the buffer, then
    recompute the burst for EVERY retained anchor second (order- and
    batch-boundary-insensitive), and prune seconds below
    ``watermark − 59``.

    Pruning is provably lossless under watermark semantics: a window
    contribution (anchor a, member m, m ∈ [a−59, a]) is only missed if
    m was pruned before a arrived — but m is pruned only once
    wm − 59 > m, i.e. wm > a, and an arrival of a after that point is
    behind the watermark and dropped by the engine anyway. So per-batch
    full recompute over the retained buffer + monotone max equals the
    batch range-frame answer on the non-late stream.
    """
    import numpy as np

    (user_id,) = key
    if state.exists:
        secs, counts, best = state.get
        bucket = dict(zip(secs, counts))
    else:
        bucket, best = {}, 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        vc = pdf["sec"].value_counts()
        for s, c in vc.items():
            bucket[int(s)] = bucket.get(int(s), 0) + int(c)
    if bucket:
        arr = np.array(sorted(bucket), dtype=np.int64)
        cnt = np.array([bucket[s] for s in arr], dtype=np.int64)
        csum = np.concatenate([[0], np.cumsum(cnt)])
        # burst at anchor a = events in [a-59, a] (inclusive range frame)
        lo = np.searchsorted(arr, arr - (BURST_WINDOW_S - 1), side="left")
        hi = np.arange(1, len(arr) + 1)
        best = max(best, int((csum[hi] - csum[lo]).max()))
        wm_sec = state.getCurrentWatermarkMs() // 1000
        keep = arr >= wm_sec - (BURST_WINDOW_S - 1)
        arr, cnt = arr[keep], cnt[keep]
        state.update((arr.tolist(), cnt.tolist(), best))
    else:
        state.update(([], [], best))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "max_burst": [best],
            "flagged": [best >= BURST_THRESHOLD],
        }
    )


def burst_users(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """events stream → continuously-updated per-user
    ``(max_burst, flagged)`` rows — the streaming twin of the batch
    ``bot_burst_users`` query (max events in any rolling 60 s window).

    The event-time watermark both drops late rows and bounds the state
    buffer: each user holds at most ``60 s + delay`` worth of per-second
    counts, so state is O(users), never O(events)."""
    from pyspark.sql import functions as F

    keyed = events.withWatermark("ts", delay).select(
        "user_id", "ts", F.unix_timestamp("ts").alias("sec")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _update_burst,
        outputStructType=BURST_OUTPUT_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
