"""CDC upsert sink under a mid-commit crash (round-3 verdict #5).

upsert_parquet_sink's vulnerable window: the dynamic partition
overwrite has landed (the table holds the batch's state) but the
foreachBatch call dies before Structured Streaming commits the
checkpoint. On restart the SAME batch replays against the
ALREADY-UPDATED table. Last-writer-wins with the deterministic
md5 tie-break must converge: the replayed rows rank identically to
the rows already in the table and collapse to one copy per key."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafkastreamer_spark.streaming.core import upsert_parquet_sink
from kafkastreamer_spark.streaming.sources import file_source

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("v", StringType()),
        StructField("version", LongType()),
    ]
)


class CrashAfterWrite:
    """Raises on the first post-overwrite callback, then stays quiet —
    the foreachBatch analogue of test_streaming_eos.FailOnceChannel."""

    def __init__(self):
        self.calls = 0

    def __call__(self, batch_id: int) -> None:
        self.calls += 1
        if self.calls == 1:
            raise RuntimeError("injected crash after overwrite, before ckpt commit")


def test_replay_after_mid_commit_crash_converges(spark, tmp_path):
    inp = os.path.join(str(tmp_path), "in")
    table = os.path.join(str(tmp_path), "table")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def run(hook=None):
        stream = file_source(spark, inp, SCHEMA)
        q = upsert_parquet_sink(
            stream, table, ["k"], "version", ckpt, n_buckets=16,
            post_write_hook=hook,
        )
        q.awaitTermination(120)

    def state():
        return {
            r["k"]: (r["v"], r["version"])
            for r in spark.read.parquet(table).collect()
        }

    # batch 1 applies cleanly
    spark.createDataFrame(
        [("a", "a1", 1), ("b", "b1", 1), ("c", "c1", 1)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(inp)
    run()
    assert state() == {"a": ("a1", 1), "b": ("b1", 1), "c": ("c1", 1)}

    # batch 2 lands in the table, then the "driver" dies before the
    # checkpoint commit
    spark.createDataFrame(
        [("a", "a2", 2), ("d", "d1", 1)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(inp)
    hook = CrashAfterWrite()
    with pytest.raises(Exception, match="injected crash"):
        run(hook)
    assert hook.calls == 1
    crashed = state()  # table already holds batch 2's effect
    assert crashed == {
        "a": ("a2", 2), "b": ("b1", 1), "c": ("c1", 1), "d": ("d1", 1)
    }

    # restart with the checkpoint intact: batch 2 replays against the
    # already-updated table and must converge, not duplicate
    run()
    assert state() == crashed

    # key uniqueness after replay (the raw parquet, not the dict view)
    df = spark.read.parquet(table)
    assert df.count() == df.select("k").distinct().count() == 4

    # and the sink keeps working afterwards
    spark.createDataFrame([("b", "b2", 2)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run()
    assert state()["b"] == ("b2", 2)
