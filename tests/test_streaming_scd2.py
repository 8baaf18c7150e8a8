"""Streaming SCD type-2 sink (streaming/core.scd2_upsert_sink):
version history built across micro-batches matches the batch LEAD
formulation, and a mid-commit crash replays to the identical table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafkastreamer_spark.streaming.core import scd2_upsert_sink
from kafkastreamer_spark.streaming.sources import file_source

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("v", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _ts(day: int):
    import datetime as dt

    return dt.datetime(2025, 3, day, 12, 0, 0)


def _run(spark, inp, table, ckpt, hook=None):
    stream = file_source(spark, inp, SCHEMA)
    q = scd2_upsert_sink(
        stream, table, "k", "v", "ts", ckpt, n_buckets=8, post_write_hook=hook
    )
    q.awaitTermination(120)


def _history(spark, table):
    return sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in spark.read.parquet(table).collect()
    )


def test_multi_batch_history_matches_batch_lead(spark, tmp_path):
    inp, table, ckpt = (str(tmp_path / x) for x in ("in", "tbl", "ck"))
    b1 = [(1, "a1", _ts(1)), (2, "b1", _ts(1))]
    b2 = [(1, "a2", _ts(5)), (3, "c1", _ts(6))]
    b3 = [(1, "a3", _ts(9)), (2, "b2", _ts(9))]
    for rows in (b1, b2, b3):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        _run(spark, inp, table, ckpt)

    all_changes = spark.createDataFrame(b1 + b2 + b3, SCHEMA)
    w = Window.partitionBy("k").orderBy("ts", "v")
    want = sorted(
        (r["k"], r["v"], r["ts"], r["valid_to"], r["valid_to"] is None)
        for r in all_changes.select(
            "k", "v", "ts", F.lead("ts").over(w).alias("valid_to")
        ).collect()
    )
    assert _history(spark, table) == want
    # exactly one current row per key
    cur = spark.read.parquet(table).filter("is_current")
    assert cur.count() == cur.select("k").distinct().count() == 3


def test_replay_after_mid_commit_crash_converges(spark, tmp_path):
    inp, table, ckpt = (str(tmp_path / x) for x in ("cin", "ctbl", "cck"))
    spark.createDataFrame([(1, "a1", _ts(1))], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    _run(spark, inp, table, ckpt)

    class CrashOnce:
        calls = 0

        def __call__(self, bid):
            CrashOnce.calls += 1
            if CrashOnce.calls == 1:
                raise RuntimeError("injected crash after overwrite")

    spark.createDataFrame([(1, "a2", _ts(4))], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    with pytest.raises(Exception, match="injected crash"):
        _run(spark, inp, table, ckpt, hook=CrashOnce())
    crashed = _history(spark, table)
    assert len(crashed) == 2  # overwrite landed before the crash

    _run(spark, inp, table, ckpt)  # checkpoint intact -> replay
    assert _history(spark, table) == crashed  # no duplicate versions
    closed = [r for r in crashed if r[3] is not None]
    assert len(closed) == 1 and closed[0][1] == "a1"
