"""Streaming twin of similarity_topk_incremental: the top-k result
maintained per micro-batch of arriving vectors — across a checkpoint
restart — must equal the batch brute-force entry bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamer_spark.operators.similarity import N_QUERIES, _emb
from kafkastreamer_spark.registry import REGISTRY
from kafkastreamer_spark.streaming.similarity import maintain_topk, read_topk
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table


def test_streaming_topk_matches_bruteforce(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = _emb(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    inp = str(tmp_path / "in")
    state = str(tmp_path / "topk_state")
    ckpt = str(tmp_path / "ckpt")

    # 4 arrival chunks by vec_id % 4 — deterministic, order-hostile
    # (each chunk spans the whole id range).
    chunks = [emb.filter(F.col("vec_id") % 4 == i) for i in range(4)]

    # Run 1: first two chunks.
    for c in chunks[:2]:
        c.coalesce(1).write.mode("append").parquet(inp)
    q = maintain_topk(
        file_source(spark, inp, emb.schema, max_files_per_trigger=1),
        queries,
        state,
        ckpt,
    )
    q.awaitTermination(180)

    # Mid-stream: the maintained top-k equals brute force over the
    # vectors that have arrived so far.
    arrived = spark.read.parquet(inp)
    assert 0 < arrived.count() < emb.count()
    from kafkastreamer_spark.operators._embed import cosine
    from pyspark.sql import Window

    scored = (
        arrived.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("c"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), "neighbor_id")
    want_mid = [
        tuple(r)
        for r in scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.floor(F.col("c") * 10000).alias("cosine4"),
            "rank",
        )
        .orderBy("query_id", "rank")
        .collect()
    ]
    got_mid = [tuple(r) for r in read_topk(spark, state).collect()]
    assert got_mid == want_mid

    # Run 2: restart from the same checkpoint with the rest arriving.
    for c in chunks[2:]:
        c.coalesce(1).write.mode("append").parquet(inp)
    q = maintain_topk(
        file_source(spark, inp, emb.schema, max_files_per_trigger=1),
        queries,
        state,
        ckpt,
    )
    q.awaitTermination(180)

    want = [
        tuple(r)
        for r in REGISTRY["similarity_topk_bruteforce"].fn(spark, sf_dir).collect()
    ]
    got = [tuple(r) for r in read_topk(spark, state).collect()]
    assert got == want
