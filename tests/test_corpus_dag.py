"""Round-9 stretch (VERDICT r8 #8): DAG-shaped corpus topologies —
plans/corpus_dag.py plus the CLI ``--mode corpus-dag`` surface.

1. Validation: corpus vocabulary + graph shape (one validator, two
   vocabularies), with the streaming compile-time rejections
   (batch-only stages, TTL-less exact_dedup) applied PER NODE.
2. Batch compile: 2-branch fan-out/fan-in equals composing the stage
   functions by hand.
3. Stream==batch survivors on the 2-branch DAG through the CLI, with
   arrivals in doc_id order (the dedup twins' feed discipline).
4. Node-per-query deployment (``run_corpus_dag_available_now``)
   produces the same survivors as the single-query compile.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kafkastreamer_spark.__main__ import main
from kafkastreamer_spark.plans.corpus_dag import (
    compile_corpus_dag,
    corpus_dag_from_dict,
    run_corpus_dag_available_now,
    validate_corpus_dag,
)
from kafkastreamer_spark.plans.dag import DagNode, DagSpec
from kafkastreamer_spark.plans.pipeline import TopologyError

# 2-branch fan-out/fan-in: one intake, a quality chain and a dedup
# chain, unioned into one corpus sink
TWO_BRANCH = {
    "stream_id": "cd1",
    "sinks": ["corpus"],
    "nodes": [
        {"name": "intake", "operation": "source"},
        {"name": "gq", "operation": "gopher_gate", "inputs": ["intake"]},
        {"name": "gl", "operation": "length_gate", "arg": 60,
         "inputs": ["gq"]},
        {"name": "dd", "operation": "exact_dedup", "arg": 10_000,
         "inputs": ["intake"]},
        {"name": "dl", "operation": "length_gate", "arg": 120,
         "inputs": ["dd"]},
        {"name": "corpus", "operation": "union", "inputs": ["gl", "dl"]},
    ],
}


def _docs_with_ts(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))


def test_validation_rejects_bad_shapes():
    def spec(nodes, sinks=()):
        # corpus vocabulary: missing ``arg`` means -1 (= stage default),
        # matching corpus_dag_from_dict — DagNode's dataclass default (1)
        # belongs to the int-stage vocabulary
        return DagSpec(
            nodes=tuple(DagNode(**{"arg": -1, **n}) for n in nodes),
            sinks=sinks,
        )

    with pytest.raises(TopologyError, match="not allowed"):
        validate_corpus_dag(spec([
            {"name": "s", "operation": "source"},
            {"name": "x", "operation": "adder", "inputs": ("s",)},
        ]))
    with pytest.raises(TopologyError, match="exactly one"):
        validate_corpus_dag(spec([
            {"name": "s", "operation": "source"},
            {"name": "t", "operation": "source"},
            {"name": "g", "operation": "gopher_gate", "inputs": ("s", "t")},
        ]))
    with pytest.raises(TopologyError, match=">= 2"):
        validate_corpus_dag(spec([
            {"name": "s", "operation": "source"},
            {"name": "u", "operation": "union", "inputs": ("s",)},
        ]))
    # streaming rejections, per node
    with pytest.raises(TopologyError, match="batch-only"):
        validate_corpus_dag(spec([
            {"name": "s", "operation": "source"},
            {"name": "c", "operation": "source_cap", "arg": 5,
             "inputs": ("s",)},
        ]), streaming=True)
    with pytest.raises(TopologyError, match="unbounded state"):
        validate_corpus_dag(spec([
            {"name": "s", "operation": "source"},
            {"name": "d", "operation": "exact_dedup", "inputs": ("s",)},
        ]), streaming=True)
    # ... but both are fine in batch mode
    validate_corpus_dag(spec([
        {"name": "s", "operation": "source"},
        {"name": "d", "operation": "exact_dedup", "inputs": ("s",)},
    ]))


def test_batch_compile_matches_hand_composition(spark, sf_dir):
    from kafkastreamer_spark.plans.corpus_pipeline import CORPUS_STAGES

    docs = _docs_with_ts(spark, sf_dir)
    spec = corpus_dag_from_dict(TWO_BRANCH)
    got = compile_corpus_dag(spec)({"intake": docs})["corpus"]

    gopher = CORPUS_STAGES["gopher_gate"][0]
    length = CORPUS_STAGES["length_gate"][0]
    dedup = CORPUS_STAGES["exact_dedup"][0]
    want = length(gopher(docs, 0), 60).unionByName(
        length(dedup(docs, 0), 120)
    )
    g = [tuple(r) for r in got.select("doc_id").orderBy("doc_id").collect()]
    w = [tuple(r) for r in want.select("doc_id").orderBy("doc_id").collect()]
    assert g == w and g
    # fan-out really fans out: the union is a multiset (a doc passing
    # both branches appears twice), same as the hand composition
    assert len(g) >= len({x for x in g})


def test_cli_corpus_dag_stream_matches_batch(spark, sf_dir, tmp_path):
    docs = _docs_with_ts(spark, sf_dir)
    inp = str(tmp_path / "docs_in")
    # two files -> two micro-batches, fed in doc_id order so the
    # streaming exact_dedup's first-arrival == batch's min-doc_id
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    docs.filter(F.col("doc_id") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    docs.filter(F.col("doc_id") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    topo = tmp_path / "two_branch.json"
    topo.write_text(json.dumps(TWO_BRANCH))
    out = str(tmp_path / "out")
    rc = main([
        "--topology", str(topo), "--mode", "corpus-dag",
        "--stream", "--input", inp, "--out", out,
    ])
    assert rc == 0
    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "corpus")).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in compile_corpus_dag(corpus_dag_from_dict(TWO_BRANCH))(
            {"intake": spark.read.parquet(inp)}
        )["corpus"].collect()
    )
    assert got == want and got


def test_cli_corpus_dag_stream_rejects_batch_only_node(tmp_path, sf_dir):
    bad = {
        "sinks": ["c"],
        "nodes": [
            {"name": "s", "operation": "source"},
            {"name": "c", "operation": "temperature_mix", "inputs": ["s"]},
        ],
    }
    topo = tmp_path / "bad.json"
    topo.write_text(json.dumps(bad))
    rc = main([
        "--topology", str(topo), "--mode", "corpus-dag", "--stream",
        "--input", os.path.join(sf_dir, "documents.parquet"),
        "--out", str(tmp_path / "out"),
    ])
    assert rc == 2


def test_node_per_query_deployment_matches_single_query(
    spark, sf_dir, tmp_path
):
    docs = _docs_with_ts(spark, sf_dir)
    seed = str(tmp_path / "seed")
    docs.coalesce(1).write.parquet(seed)
    spec = corpus_dag_from_dict(TWO_BRANCH, streaming=True)
    sinks = run_corpus_dag_available_now(
        spark,
        spec,
        seeds={"intake": seed},
        channel_root=str(tmp_path / "channels"),
        checkpoint_root=str(tmp_path / "ckpt"),
    )
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(sinks["corpus"]).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in compile_corpus_dag(spec)({"intake": docs})[
            "corpus"
        ].collect()
    )
    assert got == want and got
