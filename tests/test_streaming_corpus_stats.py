"""Streaming twins of batch 226: the isotropy audit and the mixture
schedule maintained incrementally must equal the batch registry
entries bit-for-bit — across micro-batch boundaries, a checkpoint
restart, and a mid-write crash (statedir window)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkastreamer_spark.registry import REGISTRY
from kafkastreamer_spark.streaming import statedir
from kafkastreamer_spark.streaming.corpus_stats import (
    maintain_isotropy_stats,
    maintain_mixture_schedule,
    read_isotropy_audit,
    read_mixture_schedule,
)
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table


class Boom(Exception):
    pass


def _crash_on(batch_no: int):
    def hook(batch_id: int) -> None:
        if batch_id == batch_no:
            raise Boom("injected")

    return hook


def test_streaming_isotropy_matches_batch(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").select("label", "embedding")
    inp = str(tmp_path / "in")
    state, ckpt = str(tmp_path / "iso_state"), str(tmp_path / "ckpt")
    # run 1: two chunks, the second crashing mid-publish; restart
    emb3 = load_table(spark, sf_dir, "embeddings")
    for i in range(2):
        emb3.filter(F.col("vec_id") % 3 == i).select(
            "label", "embedding"
        ).coalesce(1).write.mode("append").parquet(inp)
    q = maintain_isotropy_stats(
        file_source(spark, inp, emb.schema, max_files_per_trigger=1),
        state,
        ckpt,
        pre_flip_hook=_crash_on(1),
    )
    with pytest.raises(Exception):  # noqa: PT011
        q.awaitTermination(180)
    assert statedir.applied_batch(state) == 0  # batch-0 state intact

    # restart replays batch 1, then the third chunk arrives
    emb3.filter(F.col("vec_id") % 3 == 2).select(
        "label", "embedding"
    ).coalesce(1).write.mode("append").parquet(inp)
    q = maintain_isotropy_stats(
        file_source(spark, inp, emb.schema, max_files_per_trigger=1),
        state,
        ckpt,
    )
    q.awaitTermination(180)

    want = [
        tuple(r)
        for r in REGISTRY["embedding_isotropy_audit"].fn(spark, sf_dir).collect()
    ]
    got = [tuple(r) for r in read_isotropy_audit(spark, state).collect()]
    assert got == want


def test_streaming_mixture_schedule_matches_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    inp = str(tmp_path / "in")
    state, ckpt = str(tmp_path / "mix_state"), str(tmp_path / "ckpt")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
    q = maintain_mixture_schedule(
        file_source(spark, inp, docs.schema, max_files_per_trigger=1),
        state,
        ckpt,
    )
    q.awaitTermination(180)

    want = [
        tuple(r)
        for r in REGISTRY["sample_epoch_mixture_schedule"]
        .fn(spark, sf_dir)
        .collect()
    ]
    got = [tuple(r) for r in read_mixture_schedule(spark, state).collect()]
    assert got == want
