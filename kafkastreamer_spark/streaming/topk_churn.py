"""Streaming twin of the daily top-k heavy-hitter churn
(``events_topk_churn``, queries/relational24.py) — VERDICT r9 item 4,
the second round-9 analytic to get the state-bounded twin treatment.

Batch semantics being twinned: per-(day, user) activity counts, the
per-day top-k by count, then day-over-day overlap of the top-k sets
(shared tail: ``churn_from_daily``).

Streaming form: the volume-carrying stage — the per-(day, user)
running count — is the stateful operator: keyed by ``(day, user)``,
one long of state per key, emitting the updated cumulative count in
update mode every time the key is touched (the
``keyed_running_count_stateful`` shape, given an event-time key and a
TTL). The downstream top-k/overlap table is CALENDAR-BOUNDED
(|days| x k rows), so it stays a plain batch aggregation over the
emitted counts — same split as WAU (stateful distinct feeds a shared
batch tail) rather than forcing a second stateful stage into the
lineage.

Downstream contract: take the MAX emitted count per (day, user) —
counts are monotone, so max = latest — then apply
``churn_from_daily``. Within-TTL parity is exact (tested). Rows
arriving later than the watermark never reach the function at all
(the stateful exec drops them), and because the eviction horizon
(day end + ttl_days) always exceeds the lateness horizon, an evicted
key can never be resurrected with a fresh undercount: the failure
mode for too-late data is a clean drop, exactly the built-in
windowed aggregation's contract (tested, including state-store
introspection of the evicted key).

Eviction: a (day, user) key is dropped by event-time timeout once the
watermark passes ``day end + ttl_days`` — state is bounded by
ttl_days of active (day, user) pairs, the same horizon discipline as
``sliding_distinct_pairs``.

Crash/replay: state lives in the streaming state store under the
query checkpoint (restart-parity tested; RocksDB provider compatible
like the other stateful twins).

Reference parity note: the per-key running count IS the reference's
core operator (Streamer.java keyed counts) lifted to an event-time
key with TTL; the churn analytics on top are SURVEY §2 Part-B
closure with no reference analog.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_TTL_DAYS = 2


def streaming_daily_user_counts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    ttl_days: int = DEFAULT_TTL_DAYS,
) -> DataFrame:
    """Cumulative per-(day, user) activity counts ``(day, user_id,
    c)``, update mode (module docstring has the max-per-key downstream
    contract and the eviction trade). The input must carry
    ``withWatermark(ts_col, ...)``."""
    ttl_us = (ttl_days + 1) * 86400 * 1_000_000  # from day START to evict

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # day long past its horizon: forget the key
            return
        c = state.get[0] if state.exists else 0
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
        c += n_new
        state.update((c,))
        day: dt.date = key[0]
        day_start_us = (
            int(
                pd.Timestamp(day, tz="UTC").value  # midnight UTC, ns
            )
            // 1000
        )
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max((day_start_us + ttl_us) // 1000, wm_ms + 1)
        )
        yield pd.DataFrame(
            {
                "day": [day],
                "user_id": [int(key[1])],
                "c": [c],
            }
        )

    staged = events.select(
        F.to_date(ts_col).alias("day"),
        F.col(user_col).alias("user_id"),
        F.col(ts_col),
    )
    return staged.groupBy("day", "user_id").applyInPandasWithState(
        update,
        outputStructType="day date, user_id long, c long",
        stateStructType="c long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
