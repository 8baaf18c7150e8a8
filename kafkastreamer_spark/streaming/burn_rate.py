"""Streaming twin of the hopping SRE burn-rate alert
(``events_burn_rate_hopping``, queries/relational31.py) — round-10
VERDICT item #6: the multiwindow error-budget alert was the most
alert-shaped query in the registry and batch-only; it is exactly the
two-window keyed-state shape the funnel/churn twins templated.

Batch semantics being twinned: events aggregate into 5-minute
buckets (bucket, n_events, n_errors); each rule's long and short
windows — exact whole numbers of buckets — are evaluated at the
close of the latest bucket; a rule fires when BOTH windows' burn
rates are at or over its threshold.

Streaming form: the volume-carrying stage — the per-bucket running
(n, e) counts — is the stateful operator: keyed by ``bucket``, two
longs of state per key, emitting the updated cumulative pair in
update mode every time the bucket is touched (the churn twin's
``(day, user)`` running-count shape with a coarser time key and a
second counter). The alert evaluation is CALENDAR-BOUNDED (one row
per bucket in the horizon), so it stays the shared batch tail
``burn_alerts_from_buckets`` over the emitted counts — twin parity
with the registered batch query is structural: both run the exact
same tail over the exact same (bucket, n, e) contract
(``bucket_error_counts``).

Downstream contract: take the MAX emitted (n, e) per bucket —
counts are monotone, so max = latest — then apply
``burn_alerts_from_buckets``. Within-TTL parity is exact (tested).
Rows later than the watermark never reach the function (the stateful
exec drops them), and because the eviction horizon (bucket end +
ttl) exceeds the lateness horizon, an evicted bucket can never be
resurrected with a fresh undercount: the failure mode for too-late
data is a clean drop — the churn twin's contract verbatim.

Eviction: a bucket key is dropped by event-time timeout once the
watermark passes ``bucket end + ttl_s`` — live state is bounded by
(longest window + ttl) / bucket_s keys of two longs each, regardless
of event volume.

Crash/replay: state lives in the streaming state store under the
query checkpoint (restart-parity tested; RocksDB provider compatible
like the other stateful twins).

Reference parity note: the per-key running count IS the reference's
core operator (v1/src/main/java/Stream/Streamer.java keyed counts)
lifted to an event-time bucket key with TTL; the alert table on top
is SURVEY §2 Part-B ops-analytics closure with no reference analog.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kafkastreamer_spark.queries.relational31 import _BURN_BUCKET_S

DEFAULT_TTL_S = 6 * 3600  # keep a bucket for one longest-window span


def streaming_bucket_error_counts(
    events: DataFrame,
    ts_col: str = "ts",
    bucket_s: int = _BURN_BUCKET_S,
    ttl_s: int = DEFAULT_TTL_S,
) -> DataFrame:
    """Cumulative per-bucket ``(bucket, n, e)`` counts, update mode
    (module docstring has the max-per-key downstream contract and the
    eviction trade). The input must carry ``withWatermark(ts_col,
    ...)`` and columns ``event_type, ts_col``."""
    bucket_us = bucket_s * 1_000_000
    ttl_us = ttl_s * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # bucket long past its horizon: forget it
            return
        n, e = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            e += int((pdf["event_type"] == "error").sum())
        state.update((n, e))
        bucket = int(key[0])
        bucket_end_us = (bucket + 1) * bucket_us
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max((bucket_end_us + ttl_us) // 1000, wm_ms + 1)
        )
        yield pd.DataFrame({"bucket": [bucket], "n": [n], "e": [e]})

    staged = events.select(
        F.expr(f"unix_micros({ts_col}) div {bucket_us}").alias("bucket"),
        "event_type",
        F.col(ts_col),
    )
    return staged.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType="bucket long, n long, e long",
        stateStructType="n long, e long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
