"""Round-7 stretch twins (VERDICT r6 #8):

1. ``streaming_minhash_candidates_evicting`` — LSH near-dup with
   watermark-driven state eviction: within-TTL parity with the
   unbounded variant, eviction proven (a post-TTL duplicate pairs
   with nothing), checkpoint-restart recovery.
2. ``maintain_source_cap`` — deterministic per-stratum reservoir
   (md5 bottom-k per source): streamed result equals the batch
   ``sample_source_cap`` bit-for-bit across micro-batches AND a
   restart, plus a mid-write crash injection (statedir window).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafkastreamer_spark.streaming import statedir
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
    base = datetime(2026, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)
    from datetime import timedelta

    return base + timedelta(minutes=minute)


def _run_evicting(spark, inp, out, ckpt, ttl_minutes):
    from kafkastreamer_spark.streaming.dedup import (
        streaming_minhash_candidates_evicting,
    )

    stream = file_source(
        spark, inp, DOC_TS_SCHEMA, max_files_per_trigger=1
    ).withWatermark("ts", "0 seconds")
    cand = streaming_minhash_candidates_evicting(
        stream, ts_col="ts", ttl_minutes=ttl_minutes
    )

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        cand.writeStream.foreachBatch(wb)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _pairs(spark, out):
    got = set()
    if not os.path.isdir(out):
        return got
    for b in sorted(os.listdir(out)):
        for r in spark.read.parquet(os.path.join(out, b)).collect():
            got.add((r["doc_a"], r["doc_b"]))
    return got


_DUP = "the quick brown fox jumps over the lazy dog again and again today"
_FILLER = [
    "completely unrelated filler text about {} number {} with many distinct tokens",
]


def _write_file(spark, inp, rows):
    spark.createDataFrame(rows, DOC_TS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)


def test_evicting_pairs_within_ttl(spark, tmp_path):
    """Duplicates arriving within the TTL pair exactly as in the
    unbounded variant, across a micro-batch boundary."""
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    _write_file(spark, inp, [(1, _DUP, _t(0))])
    _write_file(spark, inp, [(2, _DUP, _t(5))])  # 5 min later, TTL 60
    _run_evicting(spark, inp, out, str(tmp_path / "ckpt"), ttl_minutes=60)
    assert (1, 2) in _pairs(spark, out)


def test_evicting_forgets_quiet_buckets(spark, tmp_path):
    """A duplicate arriving AFTER the bucket's TTL expired pairs with
    nothing: the eviction actually removes state (the unbounded
    variant would emit the pair — contract difference pinned here)."""
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    # batch 0: doc 1 at t=0
    _write_file(spark, inp, [(1, _DUP, _t(0))])
    # batch 1: filler far in the future -> watermark jumps past t0+TTL
    _write_file(
        spark,
        inp,
        [(100, _FILLER[0].format("gardens", 100), _t(120))],
    )
    # batch 2: more filler; doc 1's bucket times out THIS batch (no
    # new data for it, watermark from batch 1 >> t0 + 10 min TTL)
    _write_file(
        spark,
        inp,
        [(101, _FILLER[0].format("harbors", 101), _t(125))],
    )
    # batch 3: the late duplicate — bucket restarts, no pair
    _write_file(spark, inp, [(2, _DUP, _t(130))])
    _run_evicting(spark, inp, out, str(tmp_path / "ckpt"), ttl_minutes=10)
    got = _pairs(spark, out)
    assert (1, 2) not in got, f"evicted bucket still paired: {got}"

    # contrast: same stream, TTL large enough -> the pair IS emitted
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    _run_evicting(spark, inp, out2, ckpt2, ttl_minutes=10_000)
    assert (1, 2) in _pairs(spark, out2)


def test_evicting_survives_restart(spark, tmp_path):
    """Checkpoint restart mid-stream: bucket state persists across the
    stop/start, so a within-TTL duplicate arriving after the restart
    still pairs with the pre-restart doc."""
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(spark, inp, [(1, _DUP, _t(0))])
    _run_evicting(spark, inp, out, ckpt, ttl_minutes=60)
    assert _pairs(spark, out) == set()

    _write_file(spark, inp, [(2, _DUP, _t(5))])
    _run_evicting(spark, inp, out, ckpt, ttl_minutes=60)
    assert (1, 2) in _pairs(spark, out)


# ------------------------------------------------- streaming source cap


def test_streaming_source_cap_matches_batch(spark, sf_dir, tmp_path):
    from kafkastreamer_spark.registry import REGISTRY
    from kafkastreamer_spark.streaming.sampling import (
        maintain_source_cap,
        read_source_cap,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    inp = str(tmp_path / "in")
    state, ckpt = str(tmp_path / "cap_state"), str(tmp_path / "ckpt")
    # 3 order-hostile chunks, third after a restart
    for i in range(2):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
    q = maintain_source_cap(
        file_source(spark, inp, docs.schema, max_files_per_trigger=1),
        state,
        ckpt,
    )
    q.awaitTermination(180)

    docs.filter(F.col("doc_id") % 3 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    q = maintain_source_cap(
        file_source(spark, inp, docs.schema, max_files_per_trigger=1),
        state,
        ckpt,
    )
    q.awaitTermination(180)

    want = [
        tuple(r) for r in REGISTRY["sample_source_cap"].fn(spark, sf_dir).collect()
    ]
    got = [tuple(r) for r in read_source_cap(spark, state).collect()]
    assert got == want


def test_streaming_source_cap_mid_write_crash(spark, sf_dir, tmp_path):
    from kafkastreamer_spark.registry import REGISTRY
    from kafkastreamer_spark.streaming.sampling import (
        maintain_source_cap,
        read_source_cap,
    )

    class Boom(Exception):
        pass

    def crash_on_1(batch_id):
        if batch_id == 1:
            raise Boom("injected")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    inp = str(tmp_path / "in")
    state, ckpt = str(tmp_path / "cap_state"), str(tmp_path / "ckpt")
    for i in range(2):
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
    q = maintain_source_cap(
        file_source(spark, inp, docs.schema, max_files_per_trigger=1),
        state,
        ckpt,
        pre_flip_hook=crash_on_1,
    )
    with pytest.raises(Exception):  # noqa: PT011
        q.awaitTermination(180)
    assert statedir.applied_batch(state) == 0  # batch-0 state intact

    q = maintain_source_cap(
        file_source(spark, inp, docs.schema, max_files_per_trigger=1),
        state,
        ckpt,
    )
    q.awaitTermination(180)
    want = [
        tuple(r) for r in REGISTRY["sample_source_cap"].fn(spark, sf_dir).collect()
    ]
    got = [tuple(r) for r in read_source_cap(spark, state).collect()]
    assert got == want


def test_evicting_lsh_on_rocksdb_provider(spark, tmp_path):
    """100 TB posture for the evicting twin: the same within-TTL pair
    emission runs on the RocksDBStateStoreProvider (the provider the
    TTL-bounded bucket state would use at scale), with RocksDB
    artifacts present in the checkpoint."""
    import glob

    from kafkastreamer_spark.session import ROCKSDB_STATE_CONF

    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    try:
        inp, out = str(tmp_path / "in"), str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        _write_file(spark, inp, [(1, _DUP, _t(0))])
        _write_file(spark, inp, [(2, _DUP, _t(5))])
        _run_evicting(spark, inp, out, ckpt, ttl_minutes=60)
        assert (1, 2) in _pairs(spark, out)
        arts = glob.glob(f"{ckpt}/state/**/*.zip", recursive=True) + glob.glob(
            f"{ckpt}/state/**/*.changelog", recursive=True
        ) + glob.glob(f"{ckpt}/state/**/*.sst", recursive=True)
        assert arts, "no RocksDB artifacts in checkpoint state dir"
    finally:
        if prior is not None:
            spark.conf.set(key, prior)
        else:
            spark.conf.unset(key)
