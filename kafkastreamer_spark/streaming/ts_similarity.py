"""Streaming maintenance of the time-series similarity base: the
(user_id, d, c) daily-count table that batch 223's search entries
(queries/relational17.py) compute Pearson co-moments from, kept
incrementally current as events stream in.

Design: the co-moments themselves (Sx, Sxx, Sxy) are NOT streamed —
Sxx = sum over days of c(d)^2 is a square of a running count, which
no single streaming aggregation maintains additively. What IS
additive is the base: per-(user, day) counts, one update-mode
aggregation whose changed rows flow into the batchId-idempotent keyed
upsert sink (streaming/core.py upsert_parquet_sink; the count is
monotone per key, so last-writer-wins by version=c converges under
replay). Every search entry is then a pure function of the maintained
base — seed_topk_from_daily runs on it unchanged, and the twin test
asserts bit-for-bit equality with the batch entry across micro-batch
boundaries AND a checkpoint restart.

This mirrors the reference's state model one level up: the Streamer
keeps per-key running state updated record-at-a-time inside a
transaction (Streamer.java:443-466); here the per-(user,day) count is
that state, checkpoint + idempotent upsert standing in for the Kafka
transaction (same envelope as the CDC sink's crash test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kafkastreamer_spark.queries._util import epoch_us
from kafkastreamer_spark.streaming.core import upsert_parquet_sink


def daily_count_updates(events_stream: DataFrame) -> DataFrame:
    """Update-mode running (user_id, d, c) from a raw event stream —
    the same day derivation as the batch side's _daily."""
    d = F.floor(
        epoch_us(F.to_date("ts").cast("timestamp")) / 86400000000.0
    ).cast("long")
    return events_stream.groupBy("user_id", d.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def maintain_daily_counts(
    events_stream: DataFrame,
    table_dir: str,
    checkpoint: str,
    n_buckets: int = 16,
) -> StreamingQuery:
    """Keep the daily-count base current under streaming ingest.

    The update-mode aggregation emits each (user, day)'s NEW running
    count whenever a micro-batch touches it; the upsert sink applies
    them keyed on (user_id, d) with the count itself as the version —
    monotone, so batch replay after a crash converges (the sink's
    documented idempotence envelope).

    Scale: state is one long per active (user, day); the sink rewrites
    only the hash-buckets a batch touches. At 1000x users both the
    aggregation state and the upsert stay key-distributed.
    """
    return upsert_parquet_sink(
        daily_count_updates(events_stream),
        table_dir,
        key_cols=["user_id", "d"],
        version_col="c",
        checkpoint=checkpoint,
        n_buckets=n_buckets,
        output_mode="update",
    )


def read_daily_base(spark, table_dir: str) -> DataFrame:
    """The maintained base, shaped exactly like the batch _daily."""
    return spark.read.parquet(table_dir).select("user_id", "d", "c")
