"""Strict exactly-once Kafka-sink variant (streaming/eos.py): forced
batch replay must produce zero duplicates through the dedup view while
legitimate in-batch duplicates survive — the engine's answer to the
reference's per-record Kafka transaction (Streamer.java:393-415)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from kafkastreamer_spark.streaming.core import stage_transform
from kafkastreamer_spark.streaming.eos import (
    EOS_BATCH_COL,
    EOS_SEQ_COL,
    DirEosChannel,
    exactly_once_sink,
    read_exactly_once,
    stamp_batch,
)
from kafkastreamer_spark.streaming.sources import file_source, keyed_int_batch

STREAM_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("value", StringType())]
)


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path)


class FailOnceChannel:
    """Channel wrapper injecting the real EOS failure mode: the first
    produce succeeds physically but the batch then fails BEFORE the
    checkpoint commit, so Structured Streaming replays the same
    batch_id against the same offsets on restart."""

    def __init__(self, inner):
        self.inner = inner
        self.produces = 0

    def write_batch(self, df):
        self.inner.write_batch(df)
        self.produces += 1
        if self.produces == 1:
            raise RuntimeError("injected failure after produce, before ckpt commit")

    def read_all(self, spark):
        return self.inner.read_all(spark)


def test_eos_replay_intact_checkpoint(spark, tdir):
    """The failure mode the guarantee is scoped to (eos.py docstring):
    produce succeeds, batch fails before the checkpoint commit, restart
    replays the SAME batch_id/offsets from the intact checkpoint. The
    raw channel holds both physical copies; the view holds one."""
    inp = os.path.join(tdir, "in")
    ckpt = os.path.join(tdir, "ckpt")
    chan = FailOnceChannel(DirEosChannel(os.path.join(tdir, "topic")))
    keyed_int_batch(spark, 50, 2).write.mode("overwrite").parquet(inp)

    stream = stage_transform(
        file_source(spark, inp, STREAM_SCHEMA), ["adder"], quarantine=False
    )
    q = exactly_once_sink(stream, chan, ckpt)
    with pytest.raises(Exception, match="injected failure"):
        q.awaitTermination(120)
    assert chan.read_all(spark).count() == 50  # produce landed pre-failure

    # Restart with the checkpoint INTACT: batch 0 replays with the same
    # offsets and restamps byte-identical identities.
    q = exactly_once_sink(stream, chan, ckpt)
    q.awaitTermination(120)

    assert chan.read_all(spark).count() == 100
    eos = read_exactly_once(spark, chan)
    assert eos.count() == 50
    assert sorted(int(r.value) for r in eos.collect()) == list(range(1, 51))


def test_eos_replay_no_duplicates(spark, tdir):
    """Checkpoint-LOSS variant: wipe the checkpoint after a successful
    produce and rerun. With availableNow over a static directory the
    fresh checkpoint happens to re-batch identically into batch 0, so
    the view still collapses the copies — a fixture-specific property,
    NOT the general guarantee (see eos.py docstring: checkpoint loss
    can re-batch differently and leak duplicates)."""
    inp = os.path.join(tdir, "in")
    ckpt = os.path.join(tdir, "ckpt")
    chan = DirEosChannel(os.path.join(tdir, "topic"))
    keyed_int_batch(spark, 50, 2).write.mode("overwrite").parquet(inp)

    stream = stage_transform(
        file_source(spark, inp, STREAM_SCHEMA), ["adder"], quarantine=False
    )
    q = exactly_once_sink(stream, chan, ckpt)
    q.awaitTermination(120)
    assert chan.read_all(spark).count() == 50

    # Forced replay of the committed batch (producer failure after
    # produce, before checkpoint commit).
    shutil.rmtree(ckpt)
    q = exactly_once_sink(stream, chan, ckpt)
    q.awaitTermination(120)

    raw = chan.read_all(spark)
    assert raw.count() == 100  # physical layer really is at-least-once
    eos = read_exactly_once(spark, chan)
    assert eos.count() == 50  # view restores exactly-once
    # values are the stage output (i+1), each exactly once
    vals = sorted(int(r.value) for r in eos.collect())
    assert vals == list(range(1, 51))


def test_eos_keeps_legitimate_in_batch_duplicates(spark, tdir):
    """Two byte-identical records in the SAME batch are distinct events
    (distinct eos_seq) and must both survive the view; a replay of that
    batch still adds nothing."""
    inp = os.path.join(tdir, "in")
    ckpt = os.path.join(tdir, "ckpt")
    chan = DirEosChannel(os.path.join(tdir, "topic"))
    rows = [("k0", "7"), ("k0", "7"), ("k1", "9")]
    spark.createDataFrame(rows, ["key", "value"]).coalesce(1).write.parquet(inp)

    stream = file_source(spark, inp, STREAM_SCHEMA)
    q = exactly_once_sink(stream, chan, ckpt)
    q.awaitTermination(120)
    shutil.rmtree(ckpt)
    q = exactly_once_sink(stream, chan, ckpt)
    q.awaitTermination(120)

    assert chan.read_all(spark).count() == 6
    eos = read_exactly_once(spark, chan)
    got = sorted((r.key, r.value, r[EOS_SEQ_COL]) for r in eos.collect())
    assert got == [("k0", "7", 1), ("k0", "7", 2), ("k1", "9", 1)]


def test_stamp_batch_deterministic_identity(spark):
    """Stamping is a pure function of the batch multiset: same records,
    any partitioning/order -> identical (batch_id, key, value, seq)
    sets."""
    rows = [("a", "1"), ("a", "1"), ("a", "2"), ("b", "1")]
    df1 = spark.createDataFrame(rows, ["key", "value"]).repartition(4)
    df2 = spark.createDataFrame(list(reversed(rows)), ["key", "value"]).coalesce(1)
    ids = lambda df: sorted(  # noqa: E731
        (r.key, r.value, r[EOS_BATCH_COL], r[EOS_SEQ_COL])
        for r in stamp_batch(df, 3).collect()
    )
    assert ids(df1) == ids(df2)


def test_kafka_eos_channel_producer_shape(spark):
    """Broker-free shape check of the Kafka produce projection: the
    header array carries the identity as (key, binary-value) structs —
    the schema Spark's Kafka sink expects with includeHeaders."""
    df = stamp_batch(spark.createDataFrame([("k", "v")], ["key", "value"]), 11)
    out = df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.array(
            F.struct(
                F.lit(EOS_BATCH_COL).alias("key"),
                F.col(EOS_BATCH_COL).cast("string").cast("binary").alias("value"),
            ),
            F.struct(
                F.lit(EOS_SEQ_COL).alias("key"),
                F.col(EOS_SEQ_COL).cast("string").cast("binary").alias("value"),
            ),
        ).alias("headers"),
    )
    row = out.collect()[0]
    assert row.key == "k" and row.value == "v"
    hdr = {h.key: bytes(h.value).decode() for h in row.headers}
    assert hdr == {EOS_BATCH_COL: "11", EOS_SEQ_COL: "1"}
