"""Round-8 stretch twins (VERDICT r7 #8):

1. ``decontaminate_gate`` — STATE-FREE streaming benchmark
   decontamination: eval shingle set broadcast, per-doc scoring
   map-side in one Arrow pass; streamed survivors equal the batch
   operator's keep-set exactly, and the scored columns match the
   registered ``dedup_decontaminate`` rows bit-for-bit.
2. ``streaming_embedding_cosine_candidates`` — stateful SemDeDup-style
   twin of ``dedup_embedding_cosine``: sign-bucket keyed state, pair
   set (including the cosine4 fixed-point) identical to the batch
   self-join across micro-batches AND a checkpoint restart.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafkastreamer_spark.registry import REGISTRY
from kafkastreamer_spark.streaming.decontam import (
    decontaminate_gate,
    eval_shingle_set,
    with_contamination,
)
from kafkastreamer_spark.streaming.semdedup import (
    streaming_embedding_cosine_candidates,
)
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table


def _run_stream(df, out, ckpt):
    def wb(bdf, bid):
        bdf.write.mode("append").parquet(out)

    q = (
        df.writeStream.foreachBatch(wb)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


# ------------------------------------------------------ decontamination


def test_decontam_gate_stream_matches_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    ev = eval_shingle_set(
        spark, docs.filter(F.col("source") == "src0")
    )
    assert ev, "eval shingle set is empty — fixture drifted"
    train = docs.filter(F.col("source") != "src0")

    flagged = {
        r["doc_id"]
        for r in REGISTRY["dedup_decontaminate"].fn(spark, sf_dir).collect()
    }
    assert flagged, "batch operator flags nothing at this sf — weak test"
    want = {r["doc_id"] for r in train.collect()} - flagged

    inp = str(tmp_path / "in")
    mid = train.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    train.filter(F.col("doc_id") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    train.filter(F.col("doc_id") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    stream = file_source(spark, inp, train.schema, max_files_per_trigger=1)
    out = str(tmp_path / "out")
    _run_stream(decontaminate_gate(stream, ev), out, str(tmp_path / "ckpt"))
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == want


def test_with_contamination_scores_match_registered_query(spark, sf_dir):
    """The map-side scores reproduce the registered query's rows
    bit-for-bit (n_overlap, n_shingles, contam4) on the batch frame —
    no tokenizer drift, no float drift."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    ev = eval_shingle_set(spark, docs.filter(F.col("source") == "src0"))
    scored = with_contamination(
        docs.filter(F.col("source") != "src0"), ev
    )
    got = {
        r["doc_id"]: (r["n_overlap"], r["n_shingles"], r["contam4"])
        for r in scored.filter(
            (F.col("n_shingles") > 0)
            & (F.col("n_overlap") * 5 >= F.col("n_shingles"))  # ratio >= 0.2
        ).collect()
    }
    want = {
        r["doc_id"]: (r["n_overlap"], r["n_shingles"], r["contam4"])
        for r in REGISTRY["dedup_decontaminate"].fn(spark, sf_dir).collect()
    }
    assert got == want and want


def test_decontam_gate_is_stateless(spark, sf_dir, tmp_path):
    """No state directory materializes in the checkpoint: the gate
    must stay deployable without a state-store footprint."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    ev = eval_shingle_set(spark, docs.filter(F.col("source") == "src0"))
    train = docs.filter(F.col("source") != "src0").limit(50)
    inp = str(tmp_path / "in")
    train.coalesce(1).write.parquet(inp)
    stream = file_source(spark, inp, train.schema, max_files_per_trigger=1)
    ckpt = str(tmp_path / "ckpt")
    _run_stream(decontaminate_gate(stream, ev), str(tmp_path / "out"), ckpt)
    state_dir = os.path.join(ckpt, "state")
    assert not os.path.isdir(state_dir) or not os.listdir(state_dir)


# ------------------------------------------------- streaming SemDeDup


def _batch_pairs(spark, sf_dir):
    return {
        (r["vec_a"], r["vec_b"], r["cosine4"])
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, sf_dir).collect()
    }


def _stream_pairs(spark, out):
    if not os.path.isdir(out):
        return set()
    return {
        (r["vec_a"], r["vec_b"], r["cosine4"])
        for r in spark.read.parquet(out).collect()
    }


def test_semdedup_stream_matches_batch(spark, sf_dir, tmp_path):
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    want = _batch_pairs(spark, sf_dir)
    assert want, "batch operator finds no pairs at this sf — weak test"

    inp = str(tmp_path / "in")
    for i in range(3):
        vecs.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
    stream = file_source(spark, inp, vecs.schema, max_files_per_trigger=1)
    out = str(tmp_path / "out")
    _run_stream(
        streaming_embedding_cosine_candidates(stream),
        out,
        str(tmp_path / "ckpt"),
    )
    assert _stream_pairs(spark, out) == want


def test_semdedup_survives_restart(spark, sf_dir, tmp_path):
    """Bucket state persists across a stop/start: pairs spanning the
    restart are still emitted and the total equals batch truth."""
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    want = _batch_pairs(spark, sf_dir)
    inp = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    vecs.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    stream = file_source(spark, inp, vecs.schema, max_files_per_trigger=1)
    _run_stream(streaming_embedding_cosine_candidates(stream), out, ckpt)

    vecs.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    stream = file_source(spark, inp, vecs.schema, max_files_per_trigger=1)
    _run_stream(streaming_embedding_cosine_candidates(stream), out, ckpt)

    assert _stream_pairs(spark, out) == want


def test_semdedup_zero_norm_vector_is_skipped(spark, tmp_path):
    """Round-9 ADVICE-medium fix: a zero-norm vector must not raise
    ZeroDivisionError inside the stateful executor — the batch
    operator's SQL cosine is NULL for it and the pair silently drops,
    so the stream skips it and keeps emitting the real pair."""
    rows = [
        (1, [0.0, 0.0, 0.0, 0.0]),      # zero norm: pairs with it drop
        (2, [1.0, 2.0, 3.0, 4.0]),
        (3, [1.0, 2.0, 3.0, 4.0]),      # exact dup of 2: cosine 1.0
        (4, [0.0, 0.0, 0.0, 0.0]),      # second zero vec: same sign
        # bucket as 1 by construction, so the executor MUST hit the
        # zero-norm pair path (the old code raised here)
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    )
    inp = str(tmp_path / "in")
    vecs.coalesce(1).write.mode("append").parquet(inp)
    stream = file_source(spark, inp, vecs.schema, max_files_per_trigger=1)
    out = str(tmp_path / "out")
    _run_stream(
        streaming_embedding_cosine_candidates(stream),
        out,
        str(tmp_path / "ckpt"),
    )
    got = {
        (r["vec_a"], r["vec_b"], r["cosine4"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(2, 3, 10000)}
