"""CLI surface (python -m kafkastreamer_spark): the dag mode runs a
fan-out/fan-in topology JSON end-to-end and writes one directory per
sink; invalid topologies exit with code 2."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kafkastreamer_spark.__main__ import main


def test_dag_mode_end_to_end(spark, tmp_path):
    topo = tmp_path / "topo.json"
    topo.write_text(json.dumps({
        "stream_id": "t",
        "sinks": ["merged"],
        "nodes": [
            {"name": "src", "operation": "source"},
            {"name": "clean", "operation": "adder", "inputs": ["src"]},
            {"name": "left", "operation": "adder", "inputs": ["clean"]},
            {"name": "right", "operation": "diff", "inputs": ["clean"]},
            {"name": "merged", "operation": "union",
             "inputs": ["left", "right"]},
        ],
    }))
    out = str(tmp_path / "out")
    rc = main([
        "--topology", str(topo), "--mode", "dag",
        "--records", "20", "--out", out, "--show", "1",
    ])
    assert rc == 0
    vals = sorted(
        int(r["value"])
        for r in spark.read.parquet(os.path.join(out, "merged")).collect()
    )
    assert vals == sorted(list(range(0, 20)) + list(range(2, 22)))


def test_invalid_dag_exits_2(tmp_path):
    topo = tmp_path / "bad.json"
    topo.write_text(json.dumps({
        "nodes": [
            {"name": "a", "operation": "adder", "inputs": ["a"]},
        ],
    }))
    assert main(["--topology", str(topo), "--mode", "dag"]) == 2

def test_malformed_json_exits_2(tmp_path):
    """Malformed JSON (or an XML file passed with --mode dag) must hit
    the clean exit-2 path, not an uncaught JSONDecodeError."""
    topo = tmp_path / "broken.json"
    topo.write_text("{not json")
    assert main(["--topology", str(topo), "--mode", "dag"]) == 2

    xml = tmp_path / "topo.xml"
    xml.write_text("<topology><streamID>x</streamID></topology>")
    assert main(["--topology", str(xml), "--mode", "dag"]) == 2

    assert main(["--topology", str(tmp_path / "absent.json"), "--mode", "dag"]) == 2


def test_corpus_mode_end_to_end(spark, sf_dir, tmp_path):
    """Corpus mode: a reference-format topology over the hygiene
    vocabulary runs the full chain on a documents dir and writes the
    survivors — which must equal the compiled chain's own output."""
    from kafkastreamer_spark.plans.corpus_pipeline import (
        compile_corpus_pipeline,
        corpus_spec_from_dict,
    )

    chain = {
        "stream_id": "c1",
        "stages": [
            {"stage": 0, "operation": "repetition_gate"},
            {"stage": 1, "operation": "exact_dedup"},
            {"stage": 2, "operation": "source_cap", "arg": 15},
            {"stage": 3, "operation": "temperature_mix", "arg": 4},
        ],
    }
    topo = tmp_path / "corpus.json"
    topo.write_text(json.dumps(chain))
    out = str(tmp_path / "out")
    docs_path = os.path.join(sf_dir, "documents.parquet")
    rc = main([
        "--topology", str(topo), "--mode", "corpus",
        "--input", docs_path, "--out", out,
    ])
    assert rc == 0
    got = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "survivors")).collect()
    }
    want = {
        r["doc_id"]
        for r in compile_corpus_pipeline(corpus_spec_from_dict(chain))(
            spark.read.parquet(docs_path)
        ).select("doc_id").collect()
    }
    assert got == want and got


def test_corpus_stream_mode_matches_batch(spark, sf_dir, tmp_path):
    """`--mode corpus --stream` (VERDICT r7 stretch #9): the declared
    stateless-gate topology runs as a Structured Streaming job over a
    multi-file input dir through the exactly-once sink, and the
    streamed survivors equal the batch run's exactly."""
    from kafkastreamer_spark.plans.corpus_pipeline import (
        compile_corpus_pipeline,
        corpus_spec_from_dict,
    )

    chain = {
        "stream_id": "cs1",
        "stages": [
            {"stage": 0, "operation": "repetition_gate"},
            {"stage": 1, "operation": "gopher_gate"},
            {"stage": 2, "operation": "length_gate", "arg": 40},
        ],
    }
    topo = tmp_path / "corpus_stream.json"
    topo.write_text(json.dumps(chain))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    inp = str(tmp_path / "docs_in")
    # two files -> two micro-batches
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    docs.filter(F.col("doc_id") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    docs.filter(F.col("doc_id") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    out = str(tmp_path / "out")
    rc = main([
        "--topology", str(topo), "--mode", "corpus",
        "--stream", "--input", inp, "--out", out,
    ])
    assert rc == 0
    got = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "survivors")).collect()
    }
    want = {
        r["doc_id"]
        for r in compile_corpus_pipeline(corpus_spec_from_dict(chain))(
            docs
        ).select("doc_id").collect()
    }
    assert got == want and got


def test_corpus_stream_mode_rejects_batch_only_stage(spark, sf_dir, tmp_path):
    """Rank-based stages (and the TTL-less exact_dedup) fail the
    --stream run at COMPILE time with the clean exit-2 path."""
    for bad_stage in (
        {"stage": 0, "operation": "source_cap", "arg": 5},
        {"stage": 0, "operation": "exact_dedup"},
    ):
        topo = tmp_path / f"bad_{bad_stage['operation']}.json"
        topo.write_text(json.dumps({"stages": [bad_stage]}))
        rc = main([
            "--topology", str(topo), "--mode", "corpus", "--stream",
            "--input", os.path.join(sf_dir, "documents.parquet"),
            "--out", str(tmp_path / f"out_{bad_stage['operation']}"),
        ])
        assert rc == 2


def test_corpus_mode_rejects_int_ops(tmp_path):
    topo = tmp_path / "bad.json"
    topo.write_text(json.dumps({
        "stages": [{"stage": 0, "operation": "adder"}]
    }))
    rc = main(["--topology", str(topo), "--mode", "corpus"])
    assert rc == 2
