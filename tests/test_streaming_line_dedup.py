"""Round-9 stretch twin (VERDICT r8 #7): ``streaming_line_dedup`` —
the C4-style global line dedup's streaming form.

1. Within-TTL parity: streamed kept-(doc_id, li) set EQUALS the batch
   window's row_number()=1 choice when batches arrive in doc_id-range
   order (the batch-granularity feed discipline every gate twin
   documents), cross-checked against the registered
   ``dedup_lines_global`` per-doc kept counts.
2. Eviction: a line whose hash went quiet past the TTL is forgotten —
   its next occurrence is kept AGAIN (contrast-tested with a large
   TTL where it drops).
3. Checkpoint restart: state survives a stop/start, so a within-TTL
   duplicate after the restart still drops.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafkastreamer_spark.registry import REGISTRY
from kafkastreamer_spark.streaming.line_dedup import (
    lines_stream,
    streaming_line_dedup,
)
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table

DOC_TS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _t(minute: int):
    return datetime(2026, 1, 1) + timedelta(minutes=minute)


def _write_file(spark, inp, rows):
    spark.createDataFrame(rows, DOC_TS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)


def _run(spark, inp, out, ckpt, ttl_minutes):
    stream = file_source(
        spark, inp, DOC_TS_SCHEMA, max_files_per_trigger=1
    ).withWatermark("ts", "0 seconds")
    kept = streaming_line_dedup(stream, ts_col="ts", ttl_minutes=ttl_minutes)

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        kept.writeStream.foreachBatch(wb)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _kept(spark, out):
    got = set()
    if not os.path.isdir(out):
        return got
    for b in sorted(os.listdir(out)):
        for r in spark.read.parquet(os.path.join(out, b)).collect():
            got.add((r["doc_id"], r["li"]))
    return got


def test_line_dedup_matches_batch_within_ttl(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # batch truth: the registered operator's window, re-derived on the
    # same line construction
    lines = lines_stream(docs)
    w = Window.partitionBy("lh").orderBy("doc_id", "li")
    truth = lines.withColumn("rk", F.row_number().over(w))
    want = {
        (r["doc_id"], r["li"])
        for r in truth.filter("rk = 1").select("doc_id", "li").collect()
    }

    # stream in doc_id-RANGE batches (earlier doc_ids in earlier
    # batches), every arrival within the TTL
    qs = docs.approxQuantile("doc_id", [0.33, 0.66], 0.0)
    m1, m2 = int(qs[0]), int(qs[1])
    inp = str(tmp_path / "in")
    parts = [
        docs.filter(F.col("doc_id") <= m1),
        docs.filter((F.col("doc_id") > m1) & (F.col("doc_id") <= m2)),
        docs.filter(F.col("doc_id") > m2),
    ]
    for i, p in enumerate(parts):
        p.withColumn("ts", F.lit(_t(i))).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
    out = str(tmp_path / "out")
    _run(spark, inp, out, str(tmp_path / "ckpt"), ttl_minutes=10_000)
    got = _kept(spark, out)
    assert got == want
    # it actually dedups at this sf
    n_lines = lines.count()
    assert got and len(got) < n_lines

    # cross-check per-doc kept counts against the registered operator
    reg = {
        r["doc_id"]: r["n_lines_kept"]
        for r in REGISTRY["dedup_lines_global"].fn(spark, sf_dir).collect()
    }
    per_doc: dict[int, int] = {}
    for doc_id, _li in got:
        per_doc[doc_id] = per_doc.get(doc_id, 0) + 1
    for doc_id, n in reg.items():
        assert per_doc.get(doc_id, 0) == n


_LINE = "alpha beta gamma delta epsilon"  # exactly one 5-token line
_FILLER = "totally different filler tokens {}"


def test_line_dedup_evicts_after_ttl(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    _write_file(spark, inp, [(1, _LINE, _t(0))])
    # filler batches push the watermark far past t0 + TTL; the quiet
    # line times out on the second one (timer sweeps lag one batch)
    _write_file(spark, inp, [(100, _FILLER.format("one"), _t(120))])
    _write_file(spark, inp, [(101, _FILLER.format("two"), _t(125))])
    _write_file(spark, inp, [(2, _LINE, _t(130))])  # post-TTL copy
    _run(spark, inp, out, str(tmp_path / "ckpt"), ttl_minutes=10)
    got = _kept(spark, out)
    assert (1, 1) in got and (2, 1) in got  # kept AGAIN after eviction

    # contrast: large TTL -> the post-gap copy is a duplicate and drops
    out2 = str(tmp_path / "out2")
    _run(spark, inp, out2, str(tmp_path / "ckpt2"), ttl_minutes=10_000)
    got2 = _kept(spark, out2)
    assert (1, 1) in got2 and (2, 1) not in got2


def test_line_dedup_survives_restart(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_file(spark, inp, [(1, _LINE, _t(0))])
    _run(spark, inp, out, ckpt, ttl_minutes=10_000)
    assert _kept(spark, out) == {(1, 1)}

    # restart with the same checkpoint: the line's state must persist,
    # so the within-TTL duplicate drops
    _write_file(spark, inp, [(2, _LINE, _t(5))])
    _run(spark, inp, out, ckpt, ttl_minutes=10_000)
    assert _kept(spark, out) == {(1, 1)}
