"""Topology-compat mode: stage-per-query chaining through directory
channels produces the same results as the single-query compilation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafkastreamer_spark.plans import PipelineSpec, StageSpec, compile_pipeline
from kafkastreamer_spark.plans.topology_mode import (
    DirChannels,
    run_topology_available_now,
)
from kafkastreamer_spark.streaming.sources import keyed_int_batch

SPEC = PipelineSpec(
    stages=(StageSpec(0, "adder"), StageSpec(1, "adder"), StageSpec(2, "diff")),
    partitions=2,
    stream_id="t1",
)


def test_chained_matches_single_query(spark, tmp_path):
    channels = DirChannels(str(tmp_path / "ch"), "t1")
    src = keyed_int_batch(spark, 200, 2)
    src.write.mode("append").parquet(channels.path(0))

    run_topology_available_now(spark, SPEC, channels, str(tmp_path / "ckpt"))

    chained = spark.read.parquet(channels.path(3)).select(
        "key", F.col("value").cast("long").alias("value")
    )
    single = compile_pipeline(SPEC)(
        src.withColumn("value", F.col("value").cast("long"))
    )
    assert sorted(map(tuple, chained.collect())) == sorted(map(tuple, single.collect()))
    # net effect of adder,adder,diff = +1
    assert sorted(r["value"] for r in chained.collect()) == list(range(1, 201))


def test_chained_stage_restart_resumes(spark, tmp_path):
    """Each stage has its own checkpoint: re-running the chain after
    appending new input processes only (and exactly) the new records."""
    channels = DirChannels(str(tmp_path / "ch"), "t1")
    ckpt = str(tmp_path / "ckpt")
    keyed_int_batch(spark, 100, 2).write.mode("append").parquet(channels.path(0))
    run_topology_available_now(spark, SPEC, channels, ckpt)

    keyed_int_batch(spark, 250, 2).filter(
        F.col("value").cast("long") >= 100
    ).write.mode("append").parquet(channels.path(0))
    run_topology_available_now(spark, SPEC, channels, ckpt)

    out = spark.read.parquet(channels.path(3))
    vals = sorted(r["value"] for r in out.select(F.col("value").cast("long").alias("value")).collect())
    assert vals == list(range(1, 251))  # no duplicates, no gaps
