"""Round-11 batch 243: ops analytics (error streaks, MTBF/MTTR,
Pareto coverage, order backlog) and corpus/relational coverage
(boilerplate shells, n-gram novelty curve, RFM segmentation,
multi-sourcing histogram).

* ``events_error_streaks`` — longest consecutive-error run per user
  (gaps-and-islands), reported as a streak-length histogram.
* ``events_mtbf_mttr`` — mean time between failures and mean time to
  recovery per user, exact integer microseconds.
* ``events_pareto_coverage`` — how many heaviest users cover 50/80/
  90/99% of event volume (the 80-20 curve).
* ``orders_backlog_monthly`` — open-order backlog sampled at every
  month boundary via interval expansion (no months x orders cross
  join).
* ``dedup_boilerplate_edges`` — documents sharing an identical
  opening or closing 3-gram — header/footer boilerplate detection,
  the cheap precursor to affix-dedup.
* ``text_ngram_novelty_curve`` — fraction of never-seen-before
  3-grams per 50-doc bucket in doc_id order — the corpus freshness
  curve that motivates dedup before training.
* ``customer_rfm_segments`` — 3x3x3 recency/frequency/monetary
  segmentation with deterministic integer terciles.
* ``part_sourcing_histogram`` — parts by distinct supplier count
  (single- vs multi-sourced supply risk).

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B closure and
LLM-pipeline text hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import SQL_TOKENS, shingles, tokens
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# events_error_streaks
# ---------------------------------------------------------------------------


@register(
    "events_error_streaks",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   (event_type = 'error') AS is_err,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        err AS (
            SELECT user_id,
                   rn - ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY rn) AS island
            FROM seq WHERE is_err
        ),
        runs AS (
            SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
            FROM err GROUP BY 1, 2
        ),
        mx AS (SELECT user_id, max(len) AS max_streak FROM runs GROUP BY 1)
        SELECT max_streak, CAST(count(*) AS BIGINT) AS n_users
        FROM mx GROUP BY 1 ORDER BY 1
    """,
    tags=("events", "ops", "window", "gaps-islands"),
)
def events_error_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-error streak per user via gaps-and-islands
    (rn difference is constant within a run), rolled into a
    streak-length histogram.

    Scale shape: two per-user window passes (row_number over the full
    sequence, row_number over the error subsequence) plus hash
    aggregations — one shuffle by user_id that every stage reuses; the
    histogram is bounded by the longest streak.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        (F.col("event_type") == "error").alias("is_err"),
        F.row_number().over(w).alias("rn"),
    )
    err = seq.filter("is_err").select(
        "user_id",
        (
            F.col("rn")
            - F.row_number().over(Window.partitionBy("user_id").orderBy("rn"))
        ).alias("island"),
    )
    runs = err.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    mx = runs.groupBy("user_id").agg(F.max("len").alias("max_streak"))
    return (
        mx.groupBy("max_streak")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("max_streak")
    )


# ---------------------------------------------------------------------------
# events_mtbf_mttr
# ---------------------------------------------------------------------------


@register(
    "events_mtbf_mttr",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   (event_type = 'error') AS is_err,
                   MIN(CASE WHEN event_type <> 'error'
                            THEN epoch_us(ts) END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS next_ok_us
            FROM events
        ),
        err AS (SELECT * FROM seq WHERE is_err),
        per AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_errors,
                   (max(us) - min(us)) // (count(*) - 1) AS mtbf_us,
                   CAST(count(next_ok_us) AS BIGINT) AS n_recovered,
                   CASE WHEN count(next_ok_us) > 0 THEN
                       CAST(sum(next_ok_us - us) AS BIGINT)
                           // count(next_ok_us)
                   END AS mttr_us
            FROM err GROUP BY 1 HAVING count(*) >= 2
        )
        SELECT user_id, n_errors, mtbf_us, n_recovered, mttr_us
        FROM per ORDER BY user_id
    """,
    tags=("events", "ops", "sre", "window"),
)
def events_mtbf_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user mean time between failures (exact: error span div
    (n-1), which equals the mean inter-error gap) and mean time to
    recovery (error -> next non-error event), both in exact integer
    microseconds, for users with at least 2 errors.

    Scale shape: one per-user forward-looking window min (recovery
    lookup, no self-join) and one aggregation — a single user_id
    shuffle end to end.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    us = F.unix_micros(F.col("ts"))
    seq = ev.select(
        "user_id",
        "event_id",
        us.alias("us"),
        (F.col("event_type") == "error").alias("is_err"),
        F.min(F.when(F.col("event_type") != "error", us)).over(w).alias(
            "next_ok_us"
        ),
    )
    err = seq.filter("is_err")
    return (
        err.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_errors"),
            F.expr("(max(us) - min(us)) div (count(*) - 1)").alias("mtbf_us"),
            F.count("next_ok_us").cast("long").alias("n_recovered"),
            F.expr(
                "CASE WHEN count(next_ok_us) > 0 THEN"
                " sum(next_ok_us - us) div count(next_ok_us) END"
            ).alias("mttr_us"),
        )
        .filter(F.col("n_errors") >= 2)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# events_pareto_coverage
# ---------------------------------------------------------------------------

_PARETO_THRESHOLDS = (50, 80, 90, 99)


@register(
    "events_pareto_coverage",
    oracle=f"""
        WITH per AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        ranked AS (
            SELECT c,
                   sum(c) OVER (ORDER BY c DESC, user_id) AS cum
            FROM per
        ),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM per)
        SELECT thr.thr,
               CAST(count_if(ranked.cum * 100 - ranked.c * 100
                             < thr.thr * tot.total) + 1 AS BIGINT)
                   AS n_users
        FROM ranked
        CROSS JOIN tot
        CROSS JOIN (SELECT unnest([{", ".join(str(t) for t in _PARETO_THRESHOLDS)}]) AS thr) thr
        GROUP BY 1 ORDER BY 1
    """,
    tags=("events", "ops", "window", "pareto"),
)
def events_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80-20 curve: the minimum number of heaviest users (count
    descending, user_id tie-break) whose cumulative volume reaches
    50/80/90/99% of all events — n_users = |{{rows strictly before the
    crossing}}| + 1, all in exact integer arithmetic (cum*100 vs
    thr*total).

    Scale shape: per-user counts shuffle once; the ranked cumulative
    sum is a single global-order window over ONE ROW PER USER (the
    classic top-heavy rollup — at 100 TB the per-user table is the
    small derived relation, and range partitioning handles the global
    sort); thresholds are a 4-row broadcast.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    per = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ranked = per.select(
        "c",
        F.sum("c")
        .over(
            Window.orderBy(F.desc("c"), "user_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum"),
    )
    tot = per.agg(F.sum("c").cast("long").alias("total"))
    thr = spark.range(0).sparkSession.createDataFrame(
        [(t,) for t in _PARETO_THRESHOLDS], "thr int"
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            (
                F.sum(
                    F.when(
                        (F.col("cum") - F.col("c")) * 100
                        < F.col("thr") * F.col("total"),
                        1,
                    ).otherwise(0)
                )
                + 1
            )
            .cast("long")
            .alias("n_users")
        )
        .orderBy("thr")
    )


# ---------------------------------------------------------------------------
# orders_backlog_monthly
# ---------------------------------------------------------------------------


@register(
    "orders_backlog_monthly",
    oracle="""
        WITH closed AS (
            SELECT o.o_orderkey, o.o_orderdate,
                   max(l.l_shipdate) AS close_ts
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
        ),
        expanded AS (
            SELECT unnest(generate_series(
                       date_trunc('month', o_orderdate)
                           + INTERVAL 1 MONTH,
                       date_trunc('month', close_ts),
                       INTERVAL 1 MONTH)) AS month
            FROM closed
        )
        SELECT month, CAST(count(*) AS BIGINT) AS n_open
        FROM expanded GROUP BY 1 ORDER BY 1
    """,
    tags=("orders", "temporal", "interval", "backlog"),
)
def orders_backlog_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog at every month boundary: an order is open at
    month-start m when it was placed strictly before m and its last
    lineitem ships at or after m (equivalently m ranges over
    (trunc(orderdate)+1month .. trunc(close))).

    Scale shape: interval EXPANSION (sequence + explode per order,
    rows bounded by order-duration months) instead of a months x
    orders cross join — each order contributes only the months it is
    actually open, then one bounded-domain aggregation.
    """
    o = widen(load_table(spark, sf_dir, "orders"))
    li = load_table(spark, sf_dir, "lineitem")
    closed = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("close_ts"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    # timestamp + interval (NOT add_months, which degrades to DATE and
    # would type-mismatch the sequence() against the timestamp stop)
    start = F.expr("date_trunc('month', o_orderdate) + INTERVAL 1 MONTH")
    stop = F.date_trunc("month", "close_ts")
    # guard: Spark's sequence() errors on start > stop (an order that
    # closes within its own placement month spans no month boundary);
    # DuckDB's generate_series returns empty — make Spark match
    months = closed.select(
        F.explode(
            F.when(
                start <= stop,
                F.sequence(start, stop, F.expr("INTERVAL 1 MONTH")),
            ).otherwise(F.array().cast("array<timestamp>"))
        ).alias("month")
    )
    return (
        months.groupBy("month")
        .agg(F.count(F.lit(1)).cast("long").alias("n_open"))
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# dedup_boilerplate_edges
# ---------------------------------------------------------------------------


@register(
    "dedup_boilerplate_edges",
    oracle=f"""
        WITH tok AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
        edges AS (
            SELECT doc_id, 'head' AS edge,
                   md5(w[1] || ' ' || w[2] || ' ' || w[3]) AS edge_hash
            FROM tok WHERE len(w) >= 3
            UNION ALL
            SELECT doc_id, 'tail' AS edge,
                   md5(w[len(w)-2] || ' ' || w[len(w)-1] || ' ' || w[len(w)])
                       AS edge_hash
            FROM tok WHERE len(w) >= 3
        )
        SELECT edge, edge_hash,
               MIN(doc_id) AS keep_doc_id,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM edges GROUP BY 1, 2 HAVING count(*) >= 2
        ORDER BY edge, keep_doc_id
    """,
    tags=("llm-data", "dedup", "boilerplate"),
)
def dedup_boilerplate_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-header / shared-footer boilerplate detection: groups of
    documents opening (or closing) with an identical 3-gram — the
    cheap precursor to affix dedup over web-crawl shells. The group
    key is a 32-byte md5 of the edge 3-gram, so the shuffle moves
    hashes, not text, and min(doc_id) picks the deterministic
    representative per group.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    tok = d.select("doc_id", tokens("text").alias("w")).filter(
        F.size("w") >= 3
    )
    edge = lambda i: F.element_at("w", i)  # noqa: E731
    edges = tok.select(
        "doc_id",
        F.lit("head").alias("edge"),
        F.md5(F.concat_ws(" ", edge(1), edge(2), edge(3))).alias("edge_hash"),
    ).unionByName(
        tok.select(
            "doc_id",
            F.lit("tail").alias("edge"),
            F.md5(F.concat_ws(" ", edge(-3), edge(-2), edge(-1))).alias(
                "edge_hash"
            ),
        )
    )
    return (
        edges.groupBy("edge", "edge_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("edge", "keep_doc_id")
    )


# ---------------------------------------------------------------------------
# text_ngram_novelty_curve
# ---------------------------------------------------------------------------

_NOVELTY_BUCKET = 50


@register(
    "text_ngram_novelty_curve",
    oracle=f"""
        WITH words AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
        sh AS (SELECT doc_id, unnest(
                   list_distinct(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
               FROM words WHERE len(w) >= 3),
        owner AS (SELECT s, min(doc_id) AS owner FROM sh GROUP BY 1),
        per AS (
            SELECT sh.doc_id,
                   CAST(count(*) AS BIGINT) AS total,
                   CAST(count_if(o.owner = sh.doc_id) AS BIGINT) AS novel
            FROM sh JOIN owner o ON o.s = sh.s
            GROUP BY 1
        )
        SELECT doc_id // {_NOVELTY_BUCKET} AS bucket,
               CAST(sum(novel) AS BIGINT) AS n_novel,
               CAST(sum(total) AS BIGINT) AS n_total,
               (sum(novel) * 10000) // sum(total) AS novelty4
        FROM per GROUP BY 1 ORDER BY 1
    """,
    tags=("llm-data", "text", "dedup", "novelty"),
)
def text_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus freshness curve: for each 50-doc bucket (in doc_id
    ingestion order), the fraction of its distinct 3-grams never seen
    in any lower-doc_id document (owner = min(doc_id) per 3-gram) —
    the curve whose collapse motivates dedup before training.

    Scale shape: the per-3-gram owner table aggregates with map-side
    combine (one row per distinct 3-gram); the posting-owner join is
    corpus-sized on BOTH sides, so it carries the merge hint per the
    broadcast-underestimate discipline (docs/BROADCAST_AUDIT.md).
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    sh = (
        d.select("doc_id", tokens("text").alias("w"))
        .select("doc_id", F.explode(shingles(F.col("w"))).alias("s"))
    )
    owner = sh.groupBy("s").agg(F.min("doc_id").alias("owner"))
    per = (
        sh.join(owner.hint("merge"), "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total"),
            F.sum(F.when(F.col("owner") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("novel"),
        )
    )
    return (
        per.groupBy(F.expr(f"doc_id div {_NOVELTY_BUCKET}").alias("bucket"))
        .agg(
            F.sum("novel").cast("long").alias("n_novel"),
            F.sum("total").cast("long").alias("n_total"),
            F.expr("(sum(novel) * 10000) div sum(total)").alias("novelty4"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# customer_rfm_segments
# ---------------------------------------------------------------------------


@register(
    "customer_rfm_segments",
    oracle="""
        WITH per AS (
            SELECT o_custkey,
                   max(o_orderdate) AS last_ts,
                   CAST(count(*) AS BIGINT) AS freq,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS mon_c
            FROM orders GROUP BY 1
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
        t AS (
            SELECT o_custkey,
                   ((ROW_NUMBER() OVER (ORDER BY last_ts DESC, o_custkey)
                     - 1) * 3) // n.n + 1 AS r_t,
                   ((ROW_NUMBER() OVER (ORDER BY freq DESC, o_custkey)
                     - 1) * 3) // n.n + 1 AS f_t,
                   ((ROW_NUMBER() OVER (ORDER BY mon_c DESC, o_custkey)
                     - 1) * 3) // n.n + 1 AS m_t
            FROM per CROSS JOIN n
        )
        SELECT r_t, f_t, m_t, CAST(count(*) AS BIGINT) AS n_customers
        FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    tags=("orders", "segmentation", "window"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3x3 RFM segmentation: per-customer recency (last order),
    frequency (order count) and monetary (exact cents), each cut into
    deterministic integer terciles via ((rn-1)*3) div n with a
    custkey tie-break — no ntile, whose tie behavior differs between
    engines.

    Scale shape: one aggregation to one row per customer, then three
    global-order window ranks over that derived (small) relation —
    the same top-heavy-rollup pattern as events_pareto_coverage.
    """
    o = widen(load_table(spark, sf_dir, "orders"))
    # keep the raw (TIMESTAMP_NTZ) max for the recency rank — only the
    # integer rank crosses engines, so no epoch conversion is needed
    # (unix_micros rejects NTZ, and an NTZ->LTZ cast would depend on
    # the driver session's timezone)
    per = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("mon_c"),
    )
    n = per.agg(F.count(F.lit(1)).cast("long").alias("n"))
    tri = lambda col: F.expr(  # noqa: E731
        f"((row_number() OVER (ORDER BY {col} DESC, o_custkey) - 1) * 3)"
        " div n + 1"
    )
    t = per.crossJoin(F.broadcast(n)).select(
        tri("last_ts").alias("r_t"),
        tri("freq").alias("f_t"),
        tri("mon_c").alias("m_t"),
    )
    return (
        t.groupBy("r_t", "f_t", "m_t")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("r_t", "f_t", "m_t")
    )


# ---------------------------------------------------------------------------
# part_sourcing_histogram
# ---------------------------------------------------------------------------


@register(
    "part_sourcing_histogram",
    oracle="""
        WITH ps AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ),
        per AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_suppliers
            FROM ps GROUP BY 1
        )
        SELECT n_suppliers, CAST(count(*) AS BIGINT) AS n_parts
        FROM per GROUP BY 1 ORDER BY 1
    """,
    tags=("lineitem", "supply-chain", "histogram"),
)
def part_sourcing_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-risk histogram: parts by their distinct supplier count
    (single-sourced parts are the risk tail). DISTINCT collapses
    lineitem with map-side partial dedup; both aggregations combine
    map-side.
    """
    li = widen(load_table(spark, sf_dir, "lineitem"))
    ps = li.select("l_partkey", "l_suppkey").distinct()
    per = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers")
    )
    return (
        per.groupBy("n_suppliers")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .orderBy("n_suppliers")
    )
