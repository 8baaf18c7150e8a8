"""Topology-compat mode: one streaming query per stage, wired through
intermediate storage (SURVEY.md §1.3 "chained queries with Kafka
topics between them").

The default engine mode compiles the whole topology into ONE query —
strictly better (no broker hop per stage). This mode reproduces the
reference's deployment shape instead: stage i consumes channel i and
produces channel i+1, each stage an independently restartable query
with its own checkpoint — the property the reference gets from one
JVM per stage (CreateBash.py:2-22) and that operators sometimes want
for per-stage scaling/upgrade.

Channels are pluggable: Kafka topics in production (`KafkaChannels`),
parquet directories for tests/local (`DirChannels` — same code path,
no broker dependency).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.query import StreamingQuery
from pyspark.sql.types import StringType, StructField, StructType

from kafkastreamer_spark.plans.pipeline import PipelineSpec, validate_spec
from kafkastreamer_spark.streaming.core import stage_transform
from kafkastreamer_spark.streaming.sources import file_source, kafka_source

RECORD_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("value", StringType())]
)


@dataclass(frozen=True)
class DirChannels:
    """Parquet-directory channels (test/local mode). Channel i is
    ``<root>/stage_<id>_<i>`` — the naming mirrors the reference's
    ``__stage_<id>_<i>`` topics (Streamer.java:89-95)."""

    root: str
    stream_id: str

    def path(self, i: int) -> str:
        return os.path.join(self.root, f"stage_{self.stream_id}_{i}")

    def read(self, spark: SparkSession, i: int) -> DataFrame:
        return file_source(spark, self.path(i), RECORD_SCHEMA)

    def writer(self, df: DataFrame, i: int, checkpoint: str):
        return (
            df.writeStream.format("parquet")
            .option("path", self.path(i))
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
        )


@dataclass(frozen=True)
class KafkaChannels:
    """Kafka-topic channels (production mode): topic per stage, same
    names as the reference."""

    bootstrap: str
    stream_id: str

    def topic(self, i: int) -> str:
        return f"__stage_{self.stream_id}_{i}"

    def read(self, spark: SparkSession, i: int) -> DataFrame:
        return kafka_source(spark, self.bootstrap, self.topic(i)).select("key", "value")

    def writer(self, df: DataFrame, i: int, checkpoint: str):
        return (
            df.selectExpr("CAST(key AS STRING) key", "CAST(value AS STRING) value")
            .writeStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("topic", self.topic(i))
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
        )


def start_stage(
    spark: SparkSession,
    spec: PipelineSpec,
    stage_idx: int,
    channels,
    checkpoint_root: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Start stage ``stage_idx`` as its own streaming query: read
    channel i, apply the stage function, write channel i+1. The last
    stage's output channel exists but nothing reads it (the reference
    suppresses last-stage output entirely, Streamer.java:375-384 —
    here it lands in the final channel as the pipeline result)."""
    spec = validate_spec(spec)
    st = spec.stages[stage_idx]
    src = channels.read(spark, stage_idx)
    out = stage_transform(src, [st.operation], quarantine=False)
    ckpt = os.path.join(checkpoint_root, f"stage{stage_idx}")
    writer = channels.writer(out, stage_idx + 1, ckpt)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_topology_available_now(
    spark: SparkSession,
    spec: PipelineSpec,
    channels,
    checkpoint_root: str,
) -> None:
    """Drain a bounded topology: run stages in order with availableNow
    triggers (each stage processes everything upstream produced).
    Unbounded deployments instead call start_stage for every stage
    concurrently and let the queries run."""
    spec = validate_spec(spec)
    for i in range(len(spec.stages)):
        q = start_stage(spark, spec, i, channels, checkpoint_root, available_now=True)
        q.awaitTermination()
