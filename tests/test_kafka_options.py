"""Reference parity of the Kafka option surface, asserted broker-free.

The sandbox has no broker, no spark-sql-kafka connector jar, and no
Python Kafka client (docs/kafka_smoke_blocker.md), so the consumer and
producer option maps are pure functions tested here against the
reference's settings:

* consumer (Streamer.java:113-120): `auto.offset.reset=earliest` at
  :119 → `startingOffsets=earliest`; `isolation.level=read_committed`
  at :118 → `kafka.isolation.level=read_committed` (passthrough
  `kafka.`-prefixed option).
* producer (Streamer.java:100-108): transactional per-record commit →
  checkpointed at-least-once micro-batch produce (strict variant in
  streaming/eos.py), so the map carries bootstrap/topic/checkpoint.
"""

from __future__ import annotations

from kafkastreamer_spark.streaming.core import kafka_producer_options
from kafkastreamer_spark.streaming.sources import kafka_consumer_options


def test_consumer_defaults_match_reference():
    opts = kafka_consumer_options("broker:9092", "stage-1")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "stage-1",
        "startingOffsets": "earliest",
        "kafka.isolation.level": "read_committed",
    }


def test_consumer_uncommitted_reads_possible_but_not_default():
    opts = kafka_consumer_options("b:9092", "t", read_committed=False)
    assert "kafka.isolation.level" not in opts


def test_consumer_backpressure_knob_is_stringly_typed():
    # DataStreamReader.options() stringifies anyway; pinning it here
    # keeps the map usable as a plain properties dict.
    opts = kafka_consumer_options("b:9092", "t", max_offsets_per_trigger=50_000)
    assert opts["maxOffsetsPerTrigger"] == "50000"


def test_producer_options_carry_checkpoint():
    opts = kafka_producer_options("broker:9092", "stage-2", "/ckpt/s2")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "stage-2",
        "checkpointLocation": "/ckpt/s2",
    }
