"""Corpus-hygiene topology compiler: the reference's pipeline format
(dict/XML, contiguous stages, whitelist) driving the LLM-data stages,
validated + compiled to one transform that reproduces the corpus-prep
capstone, batch AND (streamable prefix) streaming."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafkastreamer_spark.plans.corpus_pipeline import (
    ALLOWED_CORPUS_OPERATIONS,
    CorpusPipelineSpec,
    CorpusStageSpec,
    TopologyError,
    compile_corpus_pipeline,
    corpus_spec_from_dict,
    parse_corpus_topology_xml,
    validate_corpus_spec,
)
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table

_CAPSTONE_CHAIN = {
    "stages": [
        {"stage": 0, "operation": "repetition_gate"},
        {"stage": 1, "operation": "exact_dedup"},
        {"stage": 2, "operation": "source_cap", "arg": 15},
        {"stage": 3, "operation": "temperature_mix", "arg": 4},
    ]
}


def test_validation_mirrors_reference_errors():
    with pytest.raises(TopologyError, match="no stages"):
        validate_corpus_spec(CorpusPipelineSpec(stages=()))
    with pytest.raises(TopologyError, match="not allowed"):
        corpus_spec_from_dict(
            {"stages": [{"stage": 0, "operation": "adder"}]}
        )
    with pytest.raises(TopologyError, match="missing stage"):
        corpus_spec_from_dict(
            {"stages": [
                {"stage": 0, "operation": "repetition_gate"},
                {"stage": 2, "operation": "exact_dedup"},
            ]}
        )
    with pytest.raises(TopologyError, match="duplicate"):
        validate_corpus_spec(
            CorpusPipelineSpec(
                stages=(
                    CorpusStageSpec(0, "exact_dedup"),
                    CorpusStageSpec(0, "repetition_gate"),
                )
            )
        )
    # streaming mode rejects rank-based stages at COMPILE time
    with pytest.raises(TopologyError, match="streaming"):
        validate_corpus_spec(
            CorpusPipelineSpec(stages=(CorpusStageSpec(0, "source_cap"),)),
            streaming=True,
        )
    assert set(ALLOWED_CORPUS_OPERATIONS) == {
        "repetition_gate", "gopher_gate", "length_gate", "langid_gate",
        "exact_dedup", "source_cap", "temperature_mix",
    }


def test_xml_surface_reference_layout(tmp_path):
    xml = """<Stream id=\"77\">
      <partition value=\"2\"/>
      <jar path=\"ignored.jar\"/>
      <Streamer><stage>0</stage><operation>repetition_gate</operation></Streamer>
      <Streamer><stage>1</stage><operation>source_cap</operation><arg>10</arg></Streamer>
    </Stream>"""
    p = tmp_path / "topo.xml"
    p.write_text(xml)
    spec = parse_corpus_topology_xml(str(p))
    assert spec.stream_id == "77" and spec.partitions == 2
    assert [(s.operation, s.arg) for s in spec.stages] == [
        ("repetition_gate", -1),
        ("source_cap", 10),
    ]


def test_compiled_chain_reproduces_capstone(spark, sf_dir):
    """The declarative 4-stage topology must select EXACTLY the same
    documents as the corpus-prep capstone's hand-built chain (the
    repetition gate's expression form is parity-tested bit-identical
    to the capstone's metrics join)."""
    from kafkastreamer_spark.operators.quality import _corpus_prep_stages

    docs = load_table(spark, sf_dir, "documents")
    compiled = compile_corpus_pipeline(corpus_spec_from_dict(_CAPSTONE_CHAIN))
    got = {r["doc_id"] for r in compiled(docs).select("doc_id").collect()}
    want = {
        r["doc_id"]
        for r in _corpus_prep_stages(spark, sf_dir)["mixed"]
        .select("doc_id")
        .collect()
    }
    assert got == want and got


def test_streamable_prefix_runs_on_a_stream(spark, sf_dir, tmp_path):
    """The streamable prefix (repetition_gate -> exact_dedup) compiled
    in streaming mode over a 2-batch stream keeps exactly the batch
    chain's survivors — first-arrival dedup == lowest-id dedup when
    batches arrive in id order."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    spec = corpus_spec_from_dict(
        {"stages": [
            {"stage": 0, "operation": "repetition_gate"},
            {"stage": 1, "operation": "exact_dedup"},
        ]}
    )
    batch_got = {
        r["doc_id"]
        for r in compile_corpus_pipeline(spec)(docs).select("doc_id").collect()
    }

    inp = str(tmp_path / "in")
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    # id-ordered arrival: low-id half first
    docs.filter(F.col("doc_id") <= mid).coalesce(1).write.mode("append").parquet(inp)
    docs.filter(F.col("doc_id") > mid).coalesce(1).write.mode("append").parquet(inp)
    stream = file_source(spark, inp, docs.schema, max_files_per_trigger=1)
    gated = compile_corpus_pipeline(spec, streaming=True)(stream)
    out = str(tmp_path / "out")

    def wb(bdf, bid):
        bdf.write.mode("append").parquet(out)

    q = (
        gated.writeStream.foreachBatch(wb)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert stream_got == batch_got


def test_length_and_langid_gates(spark, sf_dir):
    """The new stateless gates agree with their reference operators:
    length_gate keeps exactly the docs with >= arg tokens
    (text_token_stats ground truth) and langid_gate keeps exactly the
    diagonal of the registered text_language_id confusion."""
    from kafkastreamer_spark.registry import REGISTRY

    docs = load_table(spark, sf_dir, "documents")
    spec = corpus_spec_from_dict(
        {"stages": [{"stage": 0, "operation": "length_gate", "arg": 56}]}
    )
    got = {
        r["doc_id"]
        for r in compile_corpus_pipeline(spec)(docs).select("doc_id").collect()
    }
    want = {
        r["doc_id"]
        for r in REGISTRY["text_token_stats"].fn(spark, sf_dir)
        .filter(F.col("n_tokens") >= 56)
        .collect()
    }
    assert got == want and got and len(got) < docs.count()

    spec = corpus_spec_from_dict(
        {"stages": [{"stage": 0, "operation": "langid_gate"}]}
    )
    got = {
        r["doc_id"]
        for r in compile_corpus_pipeline(spec)(docs).select("doc_id").collect()
    }
    want = {
        r["doc_id"]
        for r in REGISTRY["text_language_id"].fn(spark, sf_dir)
        .filter(F.col("lang_pred") == F.col("lang_true"))
        .collect()
    }
    assert got == want and got and len(got) < docs.count()


def test_gopher_gate_matches_rules_query(spark, sf_dir):
    """gopher_gate's per-source survivor counts must equal the
    registered quality_gopher_rules' pass_all column exactly."""
    from kafkastreamer_spark.registry import REGISTRY

    docs = load_table(spark, sf_dir, "documents")
    spec = corpus_spec_from_dict(
        {"stages": [{"stage": 0, "operation": "gopher_gate"}]}
    )
    got = {
        r["source"]: r["n"]
        for r in compile_corpus_pipeline(spec)(docs)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rules = {
        r["source"]: r["pass_all"]
        for r in REGISTRY["quality_gopher_rules"].fn(spark, sf_dir).collect()
    }
    want = {s_: n for s_, n in rules.items() if n > 0}
    assert got == want and got
