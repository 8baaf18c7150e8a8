"""Streaming twin of the funnel attribution-window ladder
(``events_funnel_window_ladder``, queries/relational24.py) — VERDICT
r9 item 4: the sessionization-adjacent round-9 analytics get the same
state-bounded twin discipline as WAU / rolling median / line dedup.

Batch semantics being twinned: for every entry event (``view``), the
latency to the user's NEXT conversion (``purchase``) strictly after
it; the ladder table then reads per-window conversion off those
latencies (shared tail: ``funnel_ladder_from_latencies``).

Streaming form: keyed by user, ``applyInPandasWithState`` buffers the
user's open entries and conversion timestamps, and FINALIZES an entry
only when the event-time watermark passes ``ts_a + max_window`` — at
that point every conversion that could attribute to the entry has
arrived (the watermark contract), so the emitted latency is the true
min-over-later-conversions regardless of arrival interleaving within
the horizon. This is deliberately NOT first-conversion-wins-on-
arrival: finalize-on-watermark is what makes the twin order-robust
and bit-equal to the batch min, the same reasoning as
``session_finalize_on_timeout``'s close-on-timeout.

Emitted rows: ``(user_id, event_id, lat_us)`` — ``lat_us`` NULL when
no conversion landed within ``max_window``. (The batch form records
the raw next-conversion latency even beyond the max window; both map
to the identical ladder because every rung is <= max_window —
parity-tested through the shared aggregation.)

State per user: open entries newer than the finalize horizon plus
conversion timestamps still usable by an open or future entry —
bounded by per-user activity inside one attribution window, evicted
by event-time timeout. Conversions older than every open entry are
pruned each call; a user with nothing buffered leaves no state.

Late data: rows arriving with event time at or before the current
watermark may attribute incompletely (their entry may already be
finalized) — the standard watermark trade, identical to the built-in
windowed aggregations' late-row drop.

Watermark-advancement contract: entries finalize only as the
WATERMARK moves, and Catalyst pushes this operator's event-type
filter below the EventTimeWatermark node — so rows of OTHER event
types never advance the watermark (they are dropped before the
watermark collector ever sees them; verified empirically on Spark
4.1). Heartbeat/sentinel rows used to close out an idle funnel must
therefore be entry- or conversion-typed (any user id works — the
tests use user -1). On a live stream this is moot: real traffic of
the filtered types advances the watermark continuously.

Crash/replay: all state lives in the streaming state store under the
query checkpoint; restart recovery is the engine's changelog replay
(restart-parity tested, RocksDB-compatible like the other twins).

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B streaming
closure of the funnel/attribution family.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_MAX_WINDOW_S = 86400  # the ladder's largest rung (24 h)


def streaming_funnel_latencies(
    events: DataFrame,
    ts_col: str = "ts",
    entry_type: str = "view",
    conv_type: str = "purchase",
    max_window_s: int = DEFAULT_MAX_WINDOW_S,
) -> DataFrame:
    """Per-entry next-conversion latency stream ``(user_id, event_id,
    lat_us)`` (append mode; module docstring has the finalization and
    late-data contracts). The input must carry
    ``withWatermark(ts_col, ...)`` and columns
    ``event_id, user_id, event_type, ts_col``."""
    horizon_us = max_window_s * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            pids, pts, bts = state.get
            pids, pts, bts = list(pids), list(pts), list(bts)
        else:
            pids, pts, bts = [], [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = [
                    int(v) // 1000
                    for v in pd.to_datetime(pdf[ts_col]).astype("int64")
                ]
                for eid, et, tu in zip(pdf["event_id"], pdf["is_entry"], ts_us):
                    if et:
                        pids.append(int(eid))
                        pts.append(tu)
                    else:
                        bts.append(tu)
        wm_us = state.getCurrentWatermarkMs() * 1000
        done: list[tuple[int, int | None]] = []
        keep_ids: list[int] = []
        keep_ts: list[int] = []
        for eid, ta in zip(pids, pts):
            # strict <: the conservative spelling for the boundary
            # conversion at exactly ta + horizon (lat == max window,
            # which counts). Measured semantics (round 11,
            # tests/test_streaming_funnel.py boundary test): Spark's
            # late filter keeps ts > wm_late strictly, where wm_late
            # LAGS this eviction watermark by one batch (it reflects
            # data through batch N-2) — so the boundary conversion is
            # only deliverable while wm_late is still below it, in
            # which window it lands in the same invocation as any
            # finalize and is attributed; afterwards it drops cleanly
            # at the filter. Strict < guarantees the entry outlives
            # every batch in which its boundary conversion could
            # still arrive, independent of that engine detail.
            if ta + horizon_us < wm_us:
                later = [b - ta for b in bts if b > ta]
                lat = min(later) if later else None
                done.append((eid, lat if lat is not None and lat <= horizon_us else None))
            else:
                keep_ids.append(eid)
                keep_ts.append(ta)
        # conversions only matter to entries that can still finalize:
        # open ones (b > min open ts_a) or future ones (ts_a > wm)
        floor_us = min(keep_ts) if keep_ts else wm_us
        bts = [b for b in bts if b > floor_us]
        if keep_ids or bts:
            state.update((keep_ids, keep_ts, bts))
            fire_ms = (
                (min(keep_ts) + horizon_us) // 1000
                if keep_ts
                else state.getCurrentWatermarkMs() + max_window_s * 1000
            )
            state.setTimeoutTimestamp(
                max(fire_ms, state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.remove()
        if done:
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])] * len(done),
                    "event_id": [d[0] for d in done],
                    "lat_us": pd.array(
                        [d[1] for d in done], dtype="Int64"
                    ),
                }
            )

    staged = events.filter(
        F.col("event_type").isin(entry_type, conv_type)
    ).select(
        "user_id",
        "event_id",
        (F.col("event_type") == entry_type).alias("is_entry"),
        F.col(ts_col),
    )
    return staged.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, event_id long, lat_us long",
        stateStructType=(
            "pids array<long>, pts array<long>, bts array<long>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
