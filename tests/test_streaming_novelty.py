"""Round-8 streaming-twin ratchet: the Bloom-backed novelty gate
(streaming/novelty.py) — bounded-state intake gating.

1. Gate decisions equal the EXACT sequential reference (batch-
   granularity set semantics over the same Spark-built shingle
   arrays) on the fixture — the deterministic double-hash bloom at
   m=2^22 has no consequential false positive here.
2. Mid-write crash (pre-flip, the widest window) + restart converges
   to the uninterrupted run's survivors AND bitmap, because the OR
   merge is idempotent and the pointer flip is atomic.
3. The state is BOUNDED: m/8 bytes regardless of how many documents
   stream through (the whole point vs exact seen-shingle state).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import shingles, tokens
from kafkastreamer_spark.streaming import statedir
from kafkastreamer_spark.streaming.novelty import (
    NOVELTY_THRESHOLD,
    bloom_fill_ratio,
    maintain_novelty_gate,
    read_bloom,
)
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table


def _batches(spark, sf_dir, tmp_path, n_batches=3):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    inp = str(tmp_path / "in")
    splits = []
    for i in range(n_batches):
        part = docs.filter(F.col("doc_id") % n_batches == i)
        part.coalesce(1).write.mode("append").parquet(inp)
        splits.append(part)
    return docs, inp, splits


def _exact_reference(spark, splits, threshold):
    """Sequential batch-granularity set semantics over the SAME Spark
    shingle expression: all docs of a batch score against the set as
    of the batch start; admitted docs' shingles join the set after."""
    seen: set[str] = set()
    survivors: set[int] = set()
    for part in splits:
        rows = (
            part.select("doc_id", shingles(tokens("text")).alias("sh"))
            .collect()
        )
        admitted = []
        for r in rows:
            sh = list(r["sh"])
            if not sh:
                survivors.add(r["doc_id"])
                continue
            novel = sum(1 for s in sh if s not in seen)
            if novel >= threshold * len(sh):
                survivors.add(r["doc_id"])
                admitted.append(sh)
        for sh in admitted:
            seen.update(sh)
    return survivors


def _run(spark, inp, schema, state, out, ckpt, hook=None):
    stream = file_source(spark, inp, schema, max_files_per_trigger=1)
    q = maintain_novelty_gate(
        stream, state, out, ckpt, pre_flip_hook=hook
    )
    q.awaitTermination(300)


def _survivors(spark, out):
    return {r["doc_id"] for r in spark.read.parquet(out).collect()}


def test_novelty_gate_matches_exact_reference(spark, sf_dir, tmp_path):
    docs, inp, splits = _batches(spark, sf_dir, tmp_path)
    want = _exact_reference(spark, splits, NOVELTY_THRESHOLD)
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    _run(spark, inp, docs.schema, state, out, str(tmp_path / "ckpt"))
    got = _survivors(spark, out)
    assert got == want
    # the gate actually gated: some docs rejected, some admitted
    n_docs = docs.count()
    assert got and len(got) < n_docs


def test_novelty_gate_crash_replay_converges(spark, sf_dir, tmp_path):
    class Boom(Exception):
        pass

    def crash_on_1(batch_id):
        if batch_id == 1:
            raise Boom("injected")

    docs, inp, _ = _batches(spark, sf_dir, tmp_path)
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = file_source(spark, inp, docs.schema, max_files_per_trigger=1)
    q = maintain_novelty_gate(
        stream, state, out, ckpt, pre_flip_hook=crash_on_1
    )
    with pytest.raises(Exception):  # noqa: PT011
        q.awaitTermination(300)
    assert statedir.applied_batch(state) == 0  # batch-0 bloom intact

    _run(spark, inp, docs.schema, state, out, ckpt)

    # uninterrupted twin for ground truth
    state2, out2 = str(tmp_path / "state2"), str(tmp_path / "out2")
    _run(spark, inp, docs.schema, state2, out2, str(tmp_path / "ckpt2"))
    assert _survivors(spark, out) == _survivors(spark, out2)
    assert read_bloom(spark, state) == read_bloom(spark, state2)


def test_bloom_state_is_bounded(spark, sf_dir, tmp_path):
    docs, inp, _ = _batches(spark, sf_dir, tmp_path, n_batches=2)
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    _run(spark, inp, docs.schema, state, out, str(tmp_path / "ckpt"))
    bloom = read_bloom(spark, state)
    assert len(bloom) == (1 << 22) // 8  # m/8 bytes, corpus-independent
    fill = bloom_fill_ratio(bloom)
    assert 0.0 < fill < 0.5, f"fill ratio {fill} out of healthy band"
