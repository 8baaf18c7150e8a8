"""Interval-sweep accounting and balanced corpus sharding.

Two plan shapes the engine hadn't covered yet: the event-sweep
(turn intervals into ±1 deltas, running-sum the deltas — the O(n)
alternative to interval-stabbing joins) and size-balanced round-robin
partition assignment (the corpus→training-shard step of a data
pipeline).

Reference grounding: the reference's surface is keyed running counts
over streams (v1/src/main/java/Stream/Streamer.java); the sweep is
the same running-sum primitive applied to interval endpoints, §2-B
capability closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import SQL_TOKENS, tokens
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

N_SHARDS = 8


@register(
    "orders_open_backlog_sweep",
    oracle="""
        WITH closes AS (
            SELECT l_orderkey, max(l_shipdate) AS close_d
            FROM lineitem GROUP BY l_orderkey
        ),
        deltas AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, 1 AS d
            FROM orders
            UNION ALL
            SELECT strftime(close_d + INTERVAL 1 DAY, '%Y-%m-%d'), -1
            FROM closes
        ),
        daily AS (SELECT day, CAST(sum(d) AS BIGINT) AS net_change
                  FROM deltas GROUP BY day)
        SELECT day, net_change,
               CAST(sum(net_change) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS open_orders
        FROM daily ORDER BY day
    """,
    tags=("relational", "interval", "sweep", "time"),
)
def orders_open_backlog_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time by interval sweep: each order is
    an interval [o_orderdate, last ship date]; emit +1 at open and −1
    the day after close, aggregate deltas per day, and running-sum —
    the standard O(n) sweep that answers "how many intervals cover
    day D" for EVERY day in one pass, where the naive form is an
    interval-stabbing join (days × orders range predicate).  Orders
    with no lineitems never close — identically on both engines.

    Scale shape: the close-date rollup is one orderkey shuffle with
    map-side max; the delta aggregation collapses to |distinct days|
    (calendar-bounded, a few thousand rows regardless of data scale),
    so the unpartitioned running-sum window is safe by construction.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    closes = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_d"))
    deltas = o.select(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        F.lit(1).alias("d"),
    ).unionByName(
        closes.select(
            F.date_format(F.date_add("close_d", 1), "yyyy-MM-dd").alias("day"),
            F.lit(-1).alias("d"),
        )
    )
    daily = deltas.groupBy("day").agg(F.sum("d").cast("long").alias("net_change"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "net_change",
        F.sum("net_change").over(w).cast("long").alias("open_orders"),
    ).orderBy("day")


@register(
    "corpus_shard_assignment",
    oracle=f"""
        WITH sized AS (
            SELECT doc_id, len({SQL_TOKENS}) AS n_tok FROM documents
        ),
        assigned AS (
            SELECT doc_id, n_tok,
                   CAST((row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1)
                        % {N_SHARDS} AS BIGINT) AS shard
            FROM sized
        )
        SELECT shard, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               min(n_tok) AS min_tok, max(n_tok) AS max_tok
        FROM assigned GROUP BY shard ORDER BY shard
    """,
    tags=("llm-data", "sharding", "partitioning"),
)
def corpus_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced assignment of documents to training shards:
    round-robin over the size-descending rank (LPT-style greedy
    approximation — consecutive ranks land on different shards, so
    every shard gets one doc from each size stratum and total token
    counts stay within one max-doc of each other).  This is the
    corpus→shard step before distributed tokenization/training, where
    unbalanced shards become stragglers.  Output is the per-shard
    balance report.

    Scale shape: the global size rank is the one genuinely serial
    step (a total order); at 100 TB you'd replace row_number with a
    rangepartitioned rank (df.repartitionByRange + per-partition
    offset) — semantics identical, and the histogram-building
    per-shard rollup shape is unchanged.  Documented here as the
    honest cost of exact LPT balance vs hash sharding."""
    d = widen(load_table(spark, sf_dir, "documents"))
    sized = d.select("doc_id", F.size(tokens("text")).alias("n_tok"))
    w = Window.orderBy(F.desc("n_tok"), "doc_id")
    assigned = sized.select(
        "doc_id",
        "n_tok",
        ((F.row_number().over(w) - 1) % N_SHARDS).cast("long").alias("shard"),
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
        )
        .orderBy("shard")
    )
