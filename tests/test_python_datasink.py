"""Custom Python DataSource WRITER (streaming/sources.py
register_keyval_text_sink): batch + streaming commit protocol,
manifest-gated visibility, abort cleanup."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kafkastreamer_spark.streaming.sources import (
    file_source,
    keyed_int_batch,
    read_keyval_text,
    register_keyval_text_sink,
)


@pytest.fixture()
def sink(spark):
    register_keyval_text_sink(spark)
    return spark


def test_batch_write_commit_and_readback(sink, tmp_path):
    out = str(tmp_path / "kv")
    src = keyed_int_batch(sink, 100, 2)
    src.write.format("keyval_text").mode("append").option("path", out).save()

    assert os.path.exists(os.path.join(out, "_MANIFEST"))
    back = read_keyval_text(sink, out)
    assert sorted(int(r["value"]) for r in back.collect()) == list(range(100))
    # manifest row counts sum to the dataset
    with open(os.path.join(out, "_MANIFEST")) as f:
        total = sum(int(line.split("\t")[1]) for line in f)
    assert total == 100


def test_failed_write_leaves_no_manifest(sink, tmp_path):
    out = str(tmp_path / "kvfail")
    bad = keyed_int_batch(sink, 10, 2).withColumn(
        "value",
        F.when(F.col("value") == "7", F.raise_error("boom")).otherwise(
            F.col("value")
        ),
    )
    with pytest.raises(Exception, match="boom"):
        bad.write.format("keyval_text").mode("append").option("path", out).save()
    assert not os.path.exists(os.path.join(out, "_MANIFEST"))
    # the committed-view reader sees nothing
    assert read_keyval_text(sink, out).count() == 0


def test_streaming_write_manifest_per_batch(sink, tmp_path):
    from kafkastreamer_spark.plans.topology_mode import RECORD_SCHEMA

    inp = str(tmp_path / "sin")
    for lo, hi in ((0, 30), (30, 80)):
        keyed_int_batch(sink, hi, 2).filter(
            F.col("value").cast("long") >= lo
        ).coalesce(1).write.mode("append").parquet(inp)

    out = str(tmp_path / "skv")
    stream = file_source(sink, inp, RECORD_SCHEMA, max_files_per_trigger=1)
    q = (
        stream.writeStream.format("keyval_text")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    manifests = sorted(glob.glob(os.path.join(out, "_MANIFEST.*")))
    assert len(manifests) == 2  # one per micro-batch
    back = read_keyval_text(sink, out)
    assert sorted(int(r["value"]) for r in back.collect()) == list(range(80))

def test_equals_in_value_round_trips(sink, tmp_path):
    """'k=a=b' must read back as ('k', 'a=b') — the reader splits at
    the FIRST '=' only (ADVICE r4: split_part(...,2) truncated it)."""
    out = str(tmp_path / "kveq")
    df = sink.createDataFrame(
        [("k1", "a=b"), ("k2", "x==y=z"), ("k3", "plain")],
        "key string, value string",
    )
    df.write.format("keyval_text").mode("append").option("path", out).save()
    back = {r["key"]: r["value"] for r in read_keyval_text(sink, out).collect()}
    assert back == {"k1": "a=b", "k2": "x==y=z", "k3": "plain"}


def test_wire_format_violations_rejected(sink, tmp_path):
    """'=' in a key or newline anywhere breaks the line format — the
    writer must fail the job, not silently corrupt the round-trip."""
    for rows in ([("a=b", "v")], [("k", "line1\nline2")], [("k\r", "v")]):
        out = str(tmp_path / f"kvbad{abs(hash(str(rows)))}")
        df = sink.createDataFrame(rows, "key string, value string")
        with pytest.raises(Exception, match="keyval_text"):
            df.write.format("keyval_text").mode("append").option(
                "path", out
            ).save()
        assert not os.path.exists(os.path.join(out, "_MANIFEST"))
