"""Streaming-core tests (SURVEY.md §5(2)(3)): golden expectations from
the reference's deterministic source (FIXTURES.md §B), checkpoint
restart (A3/A13 equivalence), exactly-once sink idempotence, and the
correct-rollback semantics the reference's aliasing bug lacks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafkastreamer_spark.streaming.core import (
    exactly_once_parquet_sink,
    keyed_running_count_stateful,
    running_count,
    stage_transform,
    to_memory_sink,
)
from kafkastreamer_spark.streaming.sources import file_source, keyed_int_batch

STREAM_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("value", StringType())]
)


def _write_keyed_input(spark, path: str, start: int, end: int, partitions: int = 2):
    """Reference source records i in [start, end): (Key<i%P>, str(i))."""
    df = keyed_int_batch(spark, end, partitions).filter(
        F.col("value").cast("long") >= start
    )
    df.write.mode("append").parquet(path)


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path)


def test_stage_chain_golden(spark):
    """3-stage adder chain: input i → i+3 (template.xml topology;
    FIXTURES.md §B golden expectation)."""
    src = keyed_int_batch(spark, 100, partitions=2)
    out = stage_transform(src, ["adder", "adder", "adder"]).collect()
    assert len(out) == 100
    for row in out:
        i = int(row["key"].removeprefix("Key"))
        assert (int(row["value"]) - 3) % 2 == i  # key preserved
    vals = sorted(int(r["value"]) for r in out)
    assert vals == list(range(3, 103))


def test_stage_chain_quarantine(spark):
    """Malformed payloads null out instead of crashing (§7(d); the
    reference throws NumberFormatException, Streamer.java:328)."""
    bad = spark.createDataFrame(
        [("KeyX", "not-an-int"), ("Key0", "7")], ["key", "value"]
    )
    rows = {r["key"]: r for r in stage_transform(bad, ["adder"]).collect()}
    assert rows["Key0"]["value"] == "8" and rows["Key0"]["quarantine"] is None
    assert rows["KeyX"]["value"] is None and rows["KeyX"]["quarantine"] == "not-an-int"


def test_running_count_stream(spark, tdir):
    """A9 running count over a file stream == groupBy().count()."""
    inp = os.path.join(tdir, "in")
    _write_keyed_input(spark, inp, 0, 100, partitions=4)
    stream = file_source(spark, inp, STREAM_SCHEMA)
    q = to_memory_sink(running_count(stream), "rc_sink", output_mode="complete")
    q.awaitTermination(120)
    counts = {
        r["key"]: r["count"] for r in spark.table("rc_sink").collect()
    }
    assert counts == {"Key0": 25, "Key1": 25, "Key2": 25, "Key3": 25}


def test_running_count_checkpoint_restart(spark, tdir):
    """Restart mid-stream restores state (reference changelog replay,
    Streamer.java:213-232,441-445 → Spark checkpoint recovery), and
    post-failure counts are correct — unlike the reference's no-op
    rollback (aliasing bug, Streamer.java:265)."""
    inp = os.path.join(tdir, "in")
    ckpt = os.path.join(tdir, "ckpt")
    out_dir = os.path.join(tdir, "out")

    def run_once(sink_name: str):
        stream = file_source(spark, inp, STREAM_SCHEMA)
        counted = running_count(stream)

        def write_batch(bdf, bid):
            bdf.write.mode("overwrite").parquet(os.path.join(out_dir, f"b{bid}"))

        return (
            counted.writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _write_keyed_input(spark, inp, 0, 40, partitions=2)
    q = run_once("rc1")
    q.awaitTermination(120)

    _write_keyed_input(spark, inp, 40, 100, partitions=2)
    q = run_once("rc2")
    q.awaitTermination(120)

    # The last emitted update must reflect ALL 100 records (state
    # restored across restart), i.e. 50 per key.
    batches = sorted(os.listdir(out_dir))
    last = spark.read.parquet(os.path.join(out_dir, batches[-1]))
    counts = {r["key"]: r["count"] for r in last.collect()}
    assert counts == {"Key0": 50, "Key1": 50}


def test_stateful_running_count(spark, tdir):
    """applyInPandasWithState generalization matches the built-in
    aggregate (A9 via arbitrary state)."""
    inp = os.path.join(tdir, "in")
    _write_keyed_input(spark, inp, 0, 60, partitions=3)
    stream = file_source(spark, inp, STREAM_SCHEMA)
    q = to_memory_sink(keyed_running_count_stateful(stream), "st_sink")
    q.awaitTermination(120)
    counts = {r["key"]: r["count"] for r in spark.table("st_sink").collect()}
    assert counts == {"Key0": 20, "Key1": 20, "Key2": 20}


def test_tws_running_count(spark, tdir):
    """transformWithStateInPandas (Spark 4 StatefulProcessor) matches
    the built-in aggregate — A9 on the successor stateful API, typed
    ValueState over the RocksDB provider (state off-heap; the 100 TB
    posture of session.ROCKSDB_STATE_CONF).

    Environment gate: the transformWithState driver worker speaks
    protobuf to the JVM state server
    (pyspark/sql/streaming/proto/StateMessage_pb2.py); without the
    ``protobuf`` package the query fails at state-schema validation
    with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE (verified in
    this sandbox, where installs are unavailable — the same evidence
    class as docs/kafka_smoke_blocker.md)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState driver worker requires protobuf",
    )
    from kafkastreamer_spark.session import ROCKSDB_STATE_CONF
    from kafkastreamer_spark.streaming.core import keyed_running_count_tws

    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_STATE_CONF[key])
    try:
        inp = os.path.join(tdir, "in")
        _write_keyed_input(spark, inp, 0, 60, partitions=3)
        stream = file_source(spark, inp, STREAM_SCHEMA)
        q = to_memory_sink(keyed_running_count_tws(stream), "tws_sink")
        q.awaitTermination(120)
        counts = {r["key"]: r["count"] for r in spark.table("tws_sink").collect()}
        assert counts == {"Key0": 20, "Key1": 20, "Key2": 20}
        # incremental batch: state carries forward through ValueState
        _write_keyed_input(spark, inp, 60, 90, partitions=3)
        q = to_memory_sink(keyed_running_count_tws(stream), "tws_sink2")
        q.awaitTermination(120)
        counts2 = {r["key"]: r["count"] for r in spark.table("tws_sink2").collect()}
        assert counts2 == {"Key0": 30, "Key1": 30, "Key2": 30}
    finally:
        if prior is not None:
            spark.conf.set(key, prior)
        else:
            spark.conf.unset(key)


def test_exactly_once_sink_idempotent_replay(spark, tdir):
    """§4.3 strict mode: replaying a batch id must not duplicate rows
    (the engine's answer to the reference's per-record transactions)."""
    inp = os.path.join(tdir, "in")
    ckpt = os.path.join(tdir, "ckpt")
    out = os.path.join(tdir, "eo_out")
    _write_keyed_input(spark, inp, 0, 50, partitions=2)
    stream = stage_transform(
        file_source(spark, inp, STREAM_SCHEMA), ["adder"], quarantine=False
    )
    q = exactly_once_parquet_sink(stream, out, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out).count()
    assert first == 50

    # Simulate a replay of the same micro-batch: wipe the checkpoint's
    # commit log so the batch re-runs against the same output dir.
    import shutil

    shutil.rmtree(ckpt)
    q = exactly_once_parquet_sink(stream, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 50  # no duplicates


def test_rate_source_shape(spark):
    """A1 rate-source adapter produces the reference record shape."""
    from kafkastreamer_spark.streaming.sources import rate_source

    s = rate_source(spark, rows_per_second=10, partitions=2)
    assert s.isStreaming
    assert [f.name for f in s.schema.fields] == ["key", "value"]


def test_heavy_hitters_misra_gries(spark, tdir):
    """Streaming Misra-Gries vs exact batch counts: every item with
    frequency > n/(k+1) must be retained, and estimates undershoot by
    at most n/(k+1) (the MG guarantee)."""
    from kafkastreamer_spark.streaming.core import keyed_heavy_hitters_stateful

    src_dir = os.path.join(tdir, "hh_in")
    # skewed item stream: item 'hot' dominates, tail of rare items
    rows = []
    for i in range(300):
        if i % 3 != 2:
            rows.append(("k0", "hot"))
        else:
            rows.append(("k0", f"cold{i % 7}"))
    spark.createDataFrame(rows, ["key", "value"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src_dir)

    stream = file_source(spark, src_dir, STREAM_SCHEMA, fmt="parquet")
    q = to_memory_sink(
        keyed_heavy_hitters_stateful(stream, capacity=4), "hh_out"
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT * FROM hh_out WHERE stream_len = 300"
    ).collect()  # final batch state
    assert out, "no final-state output rows"
    est = {r["item"]: r["est_count"] for r in out}
    n, k = 300, 4
    exact = {"hot": 200}
    for i in range(300):
        if i % 3 == 2:
            exact[f"cold{i % 7}"] = exact.get(f"cold{i % 7}", 0) + 1
    # items over the n/(k+1) frequency bound must be present
    for item, c in exact.items():
        if c > n / (k + 1):
            assert item in est, f"frequent item {item} evicted"
    # estimates never exceed truth and undershoot by ≤ n/(k+1)
    for item, e in est.items():
        assert e <= exact[item]
        assert exact[item] - e <= n / (k + 1)


def test_merge_upsert_sink_matches_batch(spark, tdir):
    """Streaming CDC apply: final base state == one batch groupBy over
    the whole input (stream-batch parity for the merge sink)."""
    from kafkastreamer_spark.streaming.core import merge_upsert_sink

    src_dir = os.path.join(tdir, "cdc_in")
    base_dir = os.path.join(tdir, "cdc_base")
    rows = [(f"k{i % 5}", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["key", "delta"])
    df.coalesce(2).write.mode("overwrite").parquet(src_dir)

    schema = StructType(
        [StructField("key", StringType()), StructField("delta", LongType())]
    )
    stream = file_source(spark, src_dir, schema, fmt="parquet")
    q = merge_upsert_sink(
        stream, base_dir, os.path.join(tdir, "cdc_ckpt"), delta_col="delta"
    )
    q.awaitTermination(120)

    from kafkastreamer_spark.streaming import statedir

    got = {
        r["key"]: r["total"]
        for r in statedir.read_state(spark, base_dir).collect()
    }
    want = {
        r["key"]: r["total"]
        for r in df.groupBy("key").agg(F.sum("delta").alias("total")).collect()
    }
    assert got == want


def test_running_count_on_rocksdb_state_store(spark, tdir):
    """The 100 TB state posture is 'flip the provider to RocksDB'
    (session.ROCKSDB_STATE_CONF) — this runs the A9 running count on
    the actual RocksDBStateStoreProvider (JVM-side state, rocksdbjni
    bundled with Spark 4) and checks counts AND that the checkpoint
    contains RocksDB SST/changelog artifacts, so the flip is proven
    live, not just documented. (transformWithStateInPandas also uses
    this provider but its test gates on protobuf, absent here.)"""
    from kafkastreamer_spark.session import ROCKSDB_STATE_CONF

    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    try:
        inp = os.path.join(tdir, "in")
        ckpt = os.path.join(tdir, "ckpt")
        _write_keyed_input(spark, inp, 0, 100, partitions=4)
        stream = file_source(spark, inp, STREAM_SCHEMA)
        q = (
            running_count(stream)
            .writeStream.format("memory")
            .queryName("rocksdb_rc_sink")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        counts = {
            r["key"]: r["count"] for r in spark.table("rocksdb_rc_sink").collect()
        }
        assert counts == {"Key0": 25, "Key1": 25, "Key2": 25, "Key3": 25}
        state_files = []
        for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
            state_files += files
        assert any(
            f.endswith((".sst", ".changelog", ".zip")) for f in state_files
        ), f"no RocksDB artifacts in checkpoint state dir: {state_files[:10]}"
    finally:
        for k in ROCKSDB_STATE_CONF:
            spark.conf.unset(k)
        if prior is not None:
            spark.conf.set(key, prior)


def test_upsert_parquet_sink_last_writer_wins(spark, tdir):
    """CDC-apply sink: per-key last-writer-wins across micro-batches,
    bucket-scoped rewrite (untouched buckets' files are bit-identical
    after an unrelated batch), and idempotent under full replay."""
    from pyspark.sql.types import IntegerType

    from kafkastreamer_spark.streaming.core import upsert_parquet_sink

    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("v", StringType()),
            StructField("version", LongType()),
        ]
    )
    inp = os.path.join(tdir, "in")
    table = os.path.join(tdir, "table")
    ckpt = os.path.join(tdir, "ckpt")

    def run():
        stream = file_source(spark, inp, schema)
        q = upsert_parquet_sink(stream, table, ["k"], "version", ckpt, n_buckets=16)
        q.awaitTermination(120)

    def state():
        return {
            r["k"]: (r["v"], r["version"])
            for r in spark.read.parquet(table).collect()
        }

    def files_in(bucket: int):
        d = os.path.join(table, f"_bkt={bucket}")
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    # choose keys in distinct buckets so "untouched" is checkable
    import pyspark.sql.functions as SF

    probe = spark.createDataFrame([("a",), ("b",), ("c",)], "k string").select(
        "k", SF.pmod(SF.xxhash64("k"), SF.lit(16)).cast("int").alias("b")
    )
    buckets = {r["k"]: r["b"] for r in probe.collect()}
    assert buckets["a"] != buckets["b"], buckets  # xxhash64 is fixed; holds

    spark.createDataFrame(
        [("a", "a1", 1), ("b", "b1", 1)], schema
    ).coalesce(1).write.mode("append").parquet(inp)
    run()
    assert state() == {"a": ("a1", 1), "b": ("b1", 1)}
    a_files_before = files_in(buckets["a"])

    # batch 2: update b, insert c — a's bucket must not be rewritten
    spark.createDataFrame(
        [("b", "b2", 2), ("c", "c1", 1)], schema
    ).coalesce(1).write.mode("append").parquet(inp)
    run()
    assert state() == {"a": ("a1", 1), "b": ("b2", 2), "c": ("c1", 1)}
    if buckets["a"] not in (buckets["b"], buckets["c"]):
        assert files_in(buckets["a"]) == a_files_before

    # full replay from scratch (checkpoint wiped): same converged table
    import shutil

    shutil.rmtree(ckpt)
    run()
    assert state() == {"a": ("a1", 1), "b": ("b2", 2), "c": ("c1", 1)}

    # stale version must lose
    spark.createDataFrame([("b", "b0", 0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run()
    assert state()["b"] == ("b2", 2)


def test_state_datasource_reads_checkpoint_state(spark, tdir):
    """Spark 4 state data source: the running count's state store is
    directly readable from the checkpoint as a batch DataFrame
    (format 'statestore') — state introspection for operations and
    debugging without replaying the stream. The inspected state must
    equal the counts the query emitted."""
    inp = os.path.join(tdir, "in")
    ckpt = os.path.join(tdir, "ckpt")
    _write_keyed_input(spark, inp, 0, 60, partitions=3)
    q = (
        running_count(file_source(spark, inp, STREAM_SCHEMA))
        .writeStream.format("memory")
        .queryName("sds_sink")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = {r["key"]: r["count"] for r in spark.table("sds_sink").collect()}

    state = spark.read.format("statestore").load(ckpt)
    inspected = {
        r["key"]["key"]: r["value"]["count"] for r in state.collect()
    }
    assert inspected == emitted == {"Key0": 20, "Key1": 20, "Key2": 20}


def test_keyed_int_custom_source_batch_matches_builtin(spark):
    """The registered Python data source (reference A1 as
    format('keyed_int')) must produce exactly the builtin fixture's
    rows, in parallel partitions."""
    from kafkastreamer_spark.streaming.sources import register_keyed_int_source

    register_keyed_int_source(spark)
    df = (
        spark.read.format("keyed_int")
        .option("n", 500)
        .option("partitions", 3)
        .option("tasks", 4)
        .load()
    )
    want = sorted(
        (f"Key{i % 3}", str(i)) for i in range(500)
    )
    assert sorted(map(tuple, df.collect())) == want
    assert df.rdd.getNumPartitions() == 4


def test_keyed_int_custom_source_streams_through_stage_chain(spark, tdir):
    """Streaming mode: the custom source's offset is the next id, so
    an availableNow drain through an adder stage yields each value
    exactly once (END = i + 1), across multiple micro-batches."""
    from kafkastreamer_spark.streaming.sources import register_keyed_int_source

    register_keyed_int_source(spark)
    stream = (
        spark.readStream.format("keyed_int")
        .option("n", 300)
        .option("partitions", 2)
        .option("rows_per_batch", 100)
        .load()
    )
    out = stage_transform(stream, ["adder"], quarantine=False)
    ckpt = os.path.join(tdir, "ckpt")
    # continuous micro-batches (availableNow only drains the simple
    # reader's first prefetched batch): poll until the bounded source
    # is exhausted, then stop.
    import time as _time

    q = (
        out.writeStream.format("memory")
        .queryName("ki_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = _time.time() + 120
    while _time.time() < deadline:
        if spark.table("ki_sink").count() >= 300:
            break
        _time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    vals = sorted(
        int(r["value"]) for r in spark.table("ki_sink").collect()
    )
    assert vals == list(range(1, 301))
