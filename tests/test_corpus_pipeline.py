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
    # ... and the TTL-less exact_dedup (unbounded state) likewise —
    # both the default arg and an explicit 0 (VERDICT r7 #1)
    for arg in (-1, 0):
        with pytest.raises(TopologyError, match="unbounded state"):
            validate_corpus_spec(
                CorpusPipelineSpec(
                    stages=(CorpusStageSpec(0, "exact_dedup", arg),)
                ),
                streaming=True,
            )
    # batch mode still accepts the TTL-less form (global dedup)
    validate_corpus_spec(
        CorpusPipelineSpec(stages=(CorpusStageSpec(0, "exact_dedup"),))
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
    """The streamable prefix (repetition_gate -> exact_dedup with a
    TTL) compiled in streaming mode over a 2-batch stream keeps
    exactly the batch chain's survivors — first-arrival dedup ==
    lowest-id dedup when batches arrive in id order and all
    duplicates land within the TTL window (the stage's documented
    batch-parity contract)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source",
        # synthetic event time: 1 second per doc_id — the whole table
        # spans well under the TTL below, so windowed == global dedup
        F.to_timestamp(
            F.lit("2026-01-01 00:00:00")
        ).alias("_t0"),
    ).select(
        "doc_id", "text", "lang", "source",
        (F.col("_t0") + F.make_interval(secs=F.col("doc_id"))).alias("ts"),
    )
    spec = corpus_spec_from_dict(
        {"stages": [
            {"stage": 0, "operation": "repetition_gate"},
            {"stage": 1, "operation": "exact_dedup", "arg": 100000},
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


def test_streaming_exact_dedup_requires_event_time(spark, sf_dir):
    """A TTL'd exact_dedup applied to a stream WITHOUT the ts column
    fails with a clear TopologyError before the query starts."""
    from kafkastreamer_spark.streaming.sources import rate_source

    spec = corpus_spec_from_dict(
        {"stages": [{"stage": 0, "operation": "exact_dedup", "arg": 10}]}
    )
    stream = rate_source(spark, rows_per_second=1).select(
        F.col("value").alias("doc_id"),
        F.col("value").cast("string").alias("text"),
    )
    with pytest.raises(TopologyError, match="event-time"):
        compile_corpus_pipeline(spec, streaming=True)(stream)


def test_streaming_exact_dedup_evicts_state(spark, tmp_path):
    """The TTL actually bounds state: a duplicate arriving within the
    TTL is dropped, one arriving after the hash's state was evicted
    (watermark passed first-arrival + TTL) is RE-ADMITTED — proving
    eviction happened, per the stage's documented recall contract.
    Contrast run: with a TTL covering the whole stream, the late
    duplicate stays deduped."""
    from datetime import datetime, timedelta

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    base = datetime(2026, 1, 1)

    def t(minute):
        return base + timedelta(minutes=minute)

    dup = "identical document body repeated verbatim across arrivals"

    def run(ttl, out, ckpt):
        spec = corpus_spec_from_dict(
            {"stages": [{"stage": 0, "operation": "exact_dedup", "arg": ttl}]}
        )
        stream = file_source(spark, inp, schema, max_files_per_trigger=1)
        gated = compile_corpus_pipeline(spec, streaming=True)(stream)

        def wb(bdf, bid):
            bdf.write.mode("append").parquet(out)

        q = (
            gated.writeStream.foreachBatch(wb)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {r["doc_id"] for r in spark.read.parquet(out).collect()}

    inp = str(tmp_path / "in")

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inp)

    write([(1, dup, t(0))])     # first copy
    write([(2, dup, t(5))])     # within TTL(10) -> dropped
    # two filler batches: the first advances the watermark past
    # first-copy-ts + TTL, the second lets the end-of-batch eviction
    # sweep run under that watermark (eviction lags one batch)
    write([(100, "unrelated filler advancing the watermark", t(120))])
    write([(101, "more unrelated filler for the eviction sweep", t(125))])
    write([(3, dup, t(130))])   # far past eviction -> re-admitted

    got = run(10, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    assert 1 in got and 100 in got and 101 in got
    assert 2 not in got, "within-TTL duplicate survived"
    assert 3 in got, "state was not evicted: post-TTL duplicate deduped"

    got_big = run(100000, str(tmp_path / "out2"), str(tmp_path / "ckpt2"))
    assert got_big == {1, 100, 101}, (
        f"TTL-covering run should dedup all: {got_big}"
    )


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
