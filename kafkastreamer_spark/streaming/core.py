"""Streaming core: the reference's stage semantics on Structured
Streaming (SURVEY.md §2-A A9-A13, §4.3).

One streaming query replaces the reference's chain of per-partition
JVMs: the stage functions compose into a single projection
(stages.py), the per-key running count is a streaming aggregation in
update mode (A9), and recovery/exactly-once come from checkpointing
instead of hand-rolled Kafka transactions + compacted changelog
replay (A3/A13). The reference's rollback aliasing bug
(Streamer.java:265 — old_state aliases live state, so rollback is a
no-op) is deliberately NOT reproduced: checkpointed state restores
correctly, which tests assert via stop/restart.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.query import StreamingQuery

from kafkastreamer_spark.streaming.stages import apply_stage_chain, parse_value


def stage_transform(
    stream: DataFrame, ops: Sequence[str], quarantine: bool = True
) -> DataFrame:
    """The reference's per-record compute (A10) as a stream transform:
    parse the string payload, apply the stage chain, keep the key.

    Malformed payloads (the reference crashes: Integer.parseInt,
    Streamer.java:328) become null values with the raw payload kept in
    a quarantine column — SURVEY.md §7(d).
    """
    parsed = stream.withColumn("_raw", F.col("value")).withColumn(
        "value", parse_value(F.col("value"))
    )
    out = apply_stage_chain(parsed, ops)
    out = out.select(
        "key",
        F.col("value").cast("string").alias("value"),
        F.when(F.col("value").isNull(), F.col("_raw")).alias("quarantine"),
    )
    if not quarantine:
        out = out.drop("quarantine")
    return out


def running_count(stream: DataFrame, key_col: str = "key") -> DataFrame:
    """Reference A9: per-key running count as a streaming aggregation.

    In update output mode each micro-batch emits the keys whose counts
    changed — the semantic equivalent of the reference's per-record
    state-changelog append (Streamer.java:277-281), minus the
    per-record fsync. State lives in the checkpointed state store
    (RocksDB provider at scale) instead of a compacted topic.
    """
    return stream.groupBy(key_col).agg(F.count(F.lit(1)).alias("count"))


def keyed_running_count_stateful(stream: DataFrame) -> DataFrame:
    """A9 generalized through arbitrary-stateful processing
    (applyInPandasWithState): same counts as running_count, but the
    state update is user code — the extension point for any custom
    per-key state machine the reference's Map<String,String> stood for.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        count = state.get[0] if state.exists else 0
        for pdf in pdfs:
            count += len(pdf)
        state.update((count,))
        yield pd.DataFrame({"key": [key[0]], "count": [count]})

    return stream.groupBy("key").applyInPandasWithState(
        update,
        outputStructType="key string, count long",
        stateStructType="count long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def keyed_running_count_tws(stream: DataFrame) -> DataFrame:
    """A9 through ``transformWithStateInPandas`` (Spark 4
    ``StatefulProcessor``) — the successor API to
    ``applyInPandasWithState`` with typed state primitives
    (value/list/map), timers, and per-state TTL.

    Same counts as :func:`running_count`; the per-key tally lives in a
    typed ``ValueState`` cell. Requires the RocksDB state store
    provider (the API rejects the default HDFS-backed provider), which
    is also the 100 TB posture: state off-heap + on local disk with
    changelog checkpointing (``session.ROCKSDB_STATE_CONF``).

    Reference grounding: the state cell is the engine's replacement
    for the per-instance ``Map<String,String>`` the reference mutates
    and re-serializes per record (Streamer.java:65,264-282).

    Environment note: the transformWithState driver worker requires
    the ``protobuf`` Python package (state-server protocol); the test
    gates on its presence (``tests/test_streaming.py::
    test_tws_running_count``) and skips where it cannot install.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("count", "n long")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._count.update((n,))
            yield pd.DataFrame({"key": [key[0]], "count": [n]})

        def close(self) -> None:
            pass

    return stream.groupBy("key").transformWithStateInPandas(
        RunningCount(),
        outputStructType="key string, count long",
        outputMode="update",
        timeMode="none",
    )


def to_memory_sink(
    stream: DataFrame,
    name: str,
    output_mode: str = "update",
    available_now: bool = True,
) -> StreamingQuery:
    """Memory sink for tests/inspection (bounded data only)."""
    writer = stream.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def kafka_producer_options(
    bootstrap: str, topic: str, checkpoint: str
) -> dict[str, str]:
    """Producer option map as a pure function (assertable without a
    broker; docs/kafka_smoke_blocker.md). The reference's transactional
    producer (Streamer.java:100-108) maps to checkpointed at-least-once
    here, with strict semantics layered in streaming/eos.py."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def to_kafka_sink(
    stream: DataFrame,
    bootstrap: str,
    topic: str,
    checkpoint: str,
    output_mode: str = "append",
) -> StreamingQuery:
    """Reference A11: produce (key, value) to the downstream stage
    topic. Spark's Kafka sink is at-least-once (duplicates possible on
    micro-batch replay) — the documented default path (SURVEY.md
    §4.3(1)); use exactly_once_parquet_sink / an idempotent consumer
    for strict semantics."""
    return (
        stream.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
        .writeStream.format("kafka")
        .options(**kafka_producer_options(bootstrap, topic, checkpoint))
        .outputMode(output_mode)
        .start()
    )


def exactly_once_parquet_sink(
    stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Strict end-to-end exactly-once sink (SURVEY.md §4.3(2)).

    The reference commits consumer offsets and produced records in one
    Kafka transaction per record (Streamer.java:393-415). Micro-batch
    Spark can't transact per record, but ``foreachBatch`` + a
    batchId-keyed idempotent write gives the same end-to-end
    guarantee at batch granularity: a replayed batch overwrites its
    own directory instead of duplicating. Readers see each input
    record's effect exactly once.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        # dynamic overwrite of this batch's partition only → replay-safe
        batch_df.write.mode("overwrite").parquet(target)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def keyed_heavy_hitters_stateful(
    stream: DataFrame,
    key_col: str = "key",
    item_col: str = "value",
    capacity: int = 4,
) -> DataFrame:
    """Streaming heavy hitters per key: a Misra-Gries summary of
    ``item_col`` values held in per-key state (applyInPandasWithState)
    — the bounded-memory answer to "top event types per user over an
    unbounded stream". Each batch emits the key's current candidate
    set with estimated counts.

    Guarantees (classic Misra-Gries, capacity k): every item with true
    frequency > n/(k+1) is retained, and true_count - estimate ≤ n/(k+1)
    where n is the key's stream length. State is two parallel arrays
    (items, counts) — fixed size k per key regardless of stream length,
    which is what makes this viable where an exact per-item count map
    would grow without bound (the reference's Map<String,String> state,
    Streamer.java:264-282, is the unbounded version of exactly this).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n = list(state.get[0]), list(state.get[1]), state.get[2]
        else:
            items, counts, n = [], [], 0
        mg = dict(zip(items, counts))
        for pdf in pdfs:
            for item in pdf[item_col]:
                n += 1
                if item in mg:
                    mg[item] += 1
                elif len(mg) < capacity:
                    mg[item] = 1
                else:
                    # decrement-all: drop zeroed counters
                    mg = {i: c - 1 for i, c in mg.items() if c > 1}
        items = sorted(mg)  # deterministic state/output order
        counts = [mg[i] for i in items]
        state.update((items, counts, n))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(items),
                "item": items,
                "est_count": counts,
                "stream_len": [n] * len(items),
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key string, item string, est_count long, stream_len long",
        stateStructType="items array<string>, counts array<long>, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_upsert_sink(
    stream: DataFrame,
    base_dir: str,
    checkpoint: str,
    key_col: str = "key",
    delta_col: str = "delta",
    available_now: bool = True,
    pre_flip_hook=None,
    post_publish_hook=None,
) -> StreamingQuery:
    """Streaming CDC apply: each micro-batch merges its per-key deltas
    into a parquet base table (read-modify-write via the same
    full-outer-join plan as the batch merge_upsert_customers query) —
    the foreachBatch upsert pattern that Delta/Iceberg MERGE sinks
    run under the hood.

    Crash posture: state is persisted through the crash-atomic
    versioned store (streaming/statedir.py) — each batch reads the
    current version and publishes a fresh one behind an atomic pointer
    flip, so a mid-write crash can never lose or corrupt the totals.
    Delta sums are NOT idempotent under replay, so the sink also skips
    a batch whose id the pointer already records
    (statedir.applied_batch) — exactly-once on the state table. At
    scale the base would be key-bucketed so only buckets with changes
    rewrite (upsert_parquet_sink's layout).
    """
    from kafkastreamer_spark.streaming import statedir  # noqa: PLC0415

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if statedir.applied_batch(base_dir) == batch_id:
            return  # replay of an already-published batch
        changes = batch_df.groupBy(key_col).agg(
            F.sum(delta_col).alias("_delta")
        )
        base = statedir.read_state(spark, base_dir)
        if base is None:
            base = changes.select(
                key_col, F.lit(None).cast("long").alias("total")
            ).limit(0)
        else:
            base = base.select(key_col, "total")
        merged = (
            base.alias("b")
            .join(changes.alias("c"), key_col, "full_outer")
            .select(
                F.col(key_col),
                (
                    F.coalesce(F.col("b.total"), F.lit(0))
                    + F.coalesce(F.col("c._delta"), F.lit(0))
                ).alias("total"),
            )
        )
        statedir.publish_state(
            merged, base_dir, batch_id, pre_flip_hook=pre_flip_hook
        )
        # Crash-injection point for the flip-committed-but-checkpoint-
        # uncommitted window: the replayed batch must be SKIPPED
        # (applied_batch high-water mark), never re-summed.
        if post_publish_hook is not None:
            post_publish_hook(batch_id)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def upsert_parquet_sink(
    stream: DataFrame,
    table_dir: str,
    key_cols: Sequence[str],
    version_col: str,
    checkpoint: str,
    n_buckets: int = 64,
    available_now: bool = True,
    post_write_hook=None,
    output_mode: str | None = None,
) -> StreamingQuery:
    """Streaming keyed upsert (Type-1 / last-writer-wins) into a
    hash-bucket-partitioned parquet table — the CDC-apply sink the
    reference's state-changelog consumers would need, without a table
    format.

    ``post_write_hook(batch_id)``, if given, runs after the dynamic
    overwrite lands but BEFORE foreachBatch returns (i.e. before the
    checkpoint commit) — the failure-injection point for the
    mid-commit crash test: a hook that raises simulates a driver
    death in the window where the table already holds the batch but
    the checkpoint does not, forcing a replay of the same batch
    against the already-updated table
    (tests/test_streaming_upsert_crash.py asserts convergence).

    Per micro-batch (foreachBatch):

    1. keys bucket by ``pmod(xxhash64(keys), n_buckets)`` — the same
       deterministic bucketing as the engine's sampling/split
       operators, so a key's bucket never moves;
    2. the CURRENT rows of only the AFFECTED buckets are read back
       (partition pruning on the bucket column — untouched buckets are
       never scanned);
    3. old ∪ new rank by (version desc, md5-of-row) per key, keep 1 —
       last-writer-wins with a deterministic tie-break, so replaying
       a batch converges to the same table (idempotent);
    4. dynamic partition overwrite writes ONLY the affected buckets
       (``partitionOverwriteMode=dynamic``).

    Scale: per batch the work is |batch| + |current rows in affected
    buckets|. With uniformly-hashed keys, a batch touching k distinct
    keys rewrites at most min(k, n_buckets)/n_buckets of the table —
    size n_buckets so a typical batch touches a small fraction (the
    driver-side bucket list is bounded by n_buckets, never by keys).
    The reader's view of a bucket flips atomically on the directory
    rename inside dynamic overwrite.
    """
    keys = list(key_cols)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bkt = F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int")
        batch = batch_df.withColumn("_bkt", bkt)
        affected = [r["_bkt"] for r in batch.select("_bkt").distinct().collect()]
        if not affected:
            return
        data_cols = [c for c in batch.columns]  # includes _bkt
        from kafkastreamer_spark.io import table_exists  # noqa: PLC0415

        # Existence probe, not a catch-all: a transient read error must
        # fail (and retry) the batch — swallowing it would dynamic-
        # overwrite the affected buckets with only this batch's rows.
        if table_exists(spark, table_dir):
            current = spark.read.parquet(table_dir).filter(
                F.col("_bkt").isin(affected)
            )
            merged = current.select(*data_cols).unionByName(batch.select(*data_cols))
        else:  # first batch: table doesn't exist yet
            merged = batch.select(*data_cols)
        from pyspark.sql import Window  # noqa: PLC0415

        tie = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in data_cols]))
        rn = F.row_number().over(
            Window.partitionBy(*keys).orderBy(F.col(version_col).desc(), tie)
        )
        latest = merged.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")
        (
            latest.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bkt")
            .parquet(table_dir)
        )
        if post_write_hook is not None:
            post_write_hook(batch_id)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if output_mode is not None:
        # e.g. "update" when the upstream is a running aggregation
        # (streaming/ts_similarity.py): foreachBatch then receives
        # only the keys whose value changed in this micro-batch.
        writer = writer.outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def scd2_upsert_sink(
    stream: DataFrame,
    table_dir: str,
    key_col: str,
    value_col: str,
    ts_col: str,
    checkpoint: str,
    n_buckets: int = 64,
    available_now: bool = True,
    post_write_hook=None,
) -> StreamingQuery:
    """Streaming SCD **type-2** apply: maintain a full version-history
    dimension table (one row per (key, value, valid_from) with
    valid_to = next version's start, NULL while current) from a change
    stream — the history-keeping sibling of ``upsert_parquet_sink``'s
    type-1 last-writer-wins, and the streaming twin of the batch
    ``events_scd2_intervals`` LEAD formulation.

    Per micro-batch (foreachBatch):

    1. keys bucket by ``pmod(xxhash64(key), n_buckets)`` (stable —
       a key's history never moves buckets);
    2. the existing VERSIONS of only the affected buckets read back
       (partition-pruned), reduced to their underlying change events
       (key, value, valid_from);
    3. union with the batch's change events, exact-dedup on
       (key, valid_from, value) — the replay guard: a re-applied batch
       contributes no new change events, so the rebuilt history is
       byte-identical (idempotent under the mid-commit crash window,
       same hook contract as upsert_parquet_sink);
    4. intervals recomputed per key with one LEAD window (ordered by
       valid_from, value tie-break), dynamic partition overwrite
       rewrites only the affected buckets.

    Scale: per batch the work is |batch| + |versions in affected
    buckets|; history grows per key, so at very deep histories a real
    deployment splits current/closed rows into separate partitions
    (closed rows are immutable — only the open tail rewrites). Window
    partitions are per-key version chains — bounded by change rate,
    never corpus size.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bkt = F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int")
        changes = batch_df.select(
            F.col(key_col).alias("k"),
            F.col(value_col).alias("v"),
            F.col(ts_col).alias("valid_from"),
        ).withColumn("_bkt", F.pmod(F.xxhash64("k"), F.lit(n_buckets)).cast("int"))
        affected = [r["_bkt"] for r in changes.select("_bkt").distinct().collect()]
        if not affected:
            return
        # Explicit existence probe — NOT a bare except around the read:
        # a transient IO error / corrupt footer must propagate and fail
        # the batch (checkpoint retries it), never masquerade as "first
        # batch" and dynamic-overwrite buckets with only the current
        # batch's changes (silent history loss).
        from kafkastreamer_spark.io import table_exists  # noqa: PLC0415

        if table_exists(spark, table_dir):
            existing = (
                spark.read.parquet(table_dir)
                .filter(F.col("_bkt").isin(affected))
                .select("k", "v", "valid_from", "_bkt")
            )
            events = existing.unionByName(changes)
        else:  # first batch
            events = changes
        events = events.dropDuplicates(["k", "valid_from", "v"])
        from pyspark.sql import Window  # noqa: PLC0415

        w = Window.partitionBy("k").orderBy("valid_from", "v")
        history = events.select(
            "k",
            "v",
            "valid_from",
            "_bkt",
            F.lead("valid_from").over(w).alias("valid_to"),
        ).withColumn("is_current", F.col("valid_to").isNull())
        (
            history.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bkt")
            .parquet(table_dir)
        )
        if post_write_hook is not None:
            post_write_hook(batch_id)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
