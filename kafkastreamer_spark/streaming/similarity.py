"""Streaming maintenance of a top-k similarity result under vector
ingest — the streaming twin of similarity_topk_incremental
(operators/similarity.py; PAPERS.md EDBT 2020): as embedding deltas
arrive, the per-query top-k is updated from (current top-k) union
(delta scores) only, never by rescanning the corpus.

State is the k x |queries| result table itself — tiny by construction
— persisted through the crash-atomic versioned store
(streaming/statedir.py): each batch reads the current version, writes
a FRESH version dir, then atomically flips the pointer, so a crash at
any instant (including mid-write) leaves a complete prior state and
replay converges. Replay after a crash in the window between pointer
flip and checkpoint commit also converges because the update is
idempotent: scores are deterministic functions of the vectors, the
union is deduplicated by (query, neighbor) before re-ranking, so
re-applying a batch whose scores the state already contains re-ranks
to the same table.

Contract: vectors are immutable — a vec_id is never re-emitted with a
different embedding. The pair-dedup keeps max(c) per
(query, neighbor), which equals THE one deterministic score under
immutability; if upstream could mutate a vector in place, the dedup
must instead version by batch recency (last-writer-wins), like
streaming/core.py's upsert sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kafkastreamer_spark.operators._embed import cosine
from kafkastreamer_spark.operators.similarity import TOP_K
from kafkastreamer_spark.streaming import statedir


def maintain_topk(
    vector_stream: DataFrame,
    queries_df: DataFrame,
    state_dir: str,
    checkpoint: str,
    k: int = TOP_K,
    pre_flip_hook=None,
) -> StreamingQuery:
    """Keep the per-query top-k current as vectors stream in.

    ``queries_df`` is the static query set (query_id, qv as double
    array); the stream carries (vec_id, embedding, ...) rows. Per
    micro-batch: score the delta against the broadcast queries, union
    the current state, dedup by pair, re-rank, keep k, publish a new
    state version (atomic pointer flip — see statedir.publish_state;
    ``pre_flip_hook`` is its crash-injection point, test-only).

    Scale: per batch the work is |delta| x |queries| map-side scoring
    plus a k-bounded window over (state + delta) — the corpus is never
    rescanned, exactly the incremental contract the batch entry's
    oracle proves equal to the full rescan. Because the new version is
    written to a fresh dir, the plan streams executor-side end to end
    (no driver materialization of the state).
    """
    q = queries_df.select("query_id", "qv")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = batch_df.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        scores = delta.join(
            F.broadcast(q), F.col("vec_id") != F.col("query_id")
        ).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("c"),
        )
        current = statedir.read_state(spark, state_dir)
        merged = scores if current is None else current.unionByName(scores)
        # Dedup by pair (scores are deterministic and vectors immutable,
        # so max == the one value) BEFORE ranking: this is what makes
        # batch replay after a crash idempotent instead of
        # double-counting a neighbor.
        deduped = merged.groupBy("query_id", "neighbor_id").agg(
            F.max("c").alias("c")
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("c"), "neighbor_id")
        topk = (
            deduped.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk")
            .coalesce(1)  # k x |queries| rows by construction
        )
        statedir.publish_state(
            topk, state_dir, batch_id, pre_flip_hook=pre_flip_hook
        )

    return (
        vector_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_topk(spark, state_dir: str, k: int = TOP_K) -> DataFrame:
    """The maintained result, rendered exactly like the batch entries
    (cosine4 fixed point + rank) for parity checks."""
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), "neighbor_id")
    state = statedir.read_state(spark, state_dir)
    if state is None:
        raise FileNotFoundError(f"no published state under {state_dir}")
    return (
        state.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.floor(F.col("c") * 10000).alias("cosine4"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )
