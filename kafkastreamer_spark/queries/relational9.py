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

    Scale shape: the global size rank is computed skew-free with the
    two-phase bucketed cumsum of ``operators/deskew`` (size-range
    buckets are a monotone prefix of the (n_tok DESC, doc_id) sort
    key, so the rank is bit-identical to the single-window
    formulation) — round 5 removed the one-task whole-corpus sort the
    round-4 audit had carried as prose; the mechanized plan lint now
    bans that shape outright."""
    from kafkastreamer_spark.operators.deskew import (  # noqa: PLC0415
        bucketed_row_number,
    )

    d = widen(load_table(spark, sf_dir, "documents"))
    sized = d.select("doc_id", F.size(tokens("text")).alias("n_tok"))
    ranked = bucketed_row_number(
        sized,
        [],
        F.floor(F.col("n_tok") / 16).cast("long"),
        [F.desc("n_tok"), F.asc("doc_id")],
        "_rn",
        bucket_desc=True,
    )
    assigned = ranked.select(
        "doc_id",
        "n_tok",
        ((F.col("_rn") - 1) % N_SHARDS).cast("long").alias("shard"),
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


@register(
    "agg_percentile_disc_battery",
    oracle="""
        WITH v AS (
            SELECT event_type,
                   CAST(FLOOR(value * 10000) AS BIGINT) AS v_fp,
                   event_id
            FROM events
        ),
        ranked AS (
            SELECT event_type, v_fp,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY v_fp, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
            FROM v
        )
        SELECT event_type,
               CAST(max(CASE WHEN rn = (cnt * 25 + 99) // 100 THEN v_fp END)
                    AS DOUBLE) / 10000 AS p25,
               CAST(max(CASE WHEN rn = (cnt * 50 + 99) // 100 THEN v_fp END)
                    AS DOUBLE) / 10000 AS p50,
               CAST(max(CASE WHEN rn = (cnt * 75 + 99) // 100 THEN v_fp END)
                    AS DOUBLE) / 10000 AS p75,
               CAST(max(CASE WHEN rn = (cnt * 95 + 99) // 100 THEN v_fp END)
                    AS DOUBLE) / 10000 AS p95
        FROM ranked GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "agg", "percentile"),
)
def agg_percentile_disc_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles p25/p50/p75/p95 per event type — the
    PERCENTILE_DISC(p) = element at rank ceil(p·n) definition, spelled
    out as an explicit rank filter so both engines pick the IDENTICAL
    element (engine-native quantile_disc/percentile implementations
    differ in tie and interpolation conventions; a shared rank
    formula sidesteps all of it).  ceil(p·n) is computed in integer
    space as (n·100p + 99) div 100.  One ranked pass feeds all four
    percentiles via conditional aggregation — not four sorts.

    Scale shape: one event_type-partitioned sort (same exchange every
    windowed query on this key reuses) + one map-side-combined
    rollup.  At extreme group sizes the rank filter swaps for the
    fixed-width-histogram percentile (agg_equidepth_histogram), which
    needs no per-group sort."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.floor(F.col("value") * 10000).cast("long").alias("v_fp"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("v_fp", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = v.select(
        "event_type",
        "v_fp",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )

    def pick(p: int, alias: str):
        return (
            F.max(
                F.when(
                    F.col("rn") == F.expr(f"(cnt * {p} + 99) div 100"),
                    F.col("v_fp"),
                )
            ).cast("double")
            / 10000
        ).alias(alias)

    return (
        ranked.groupBy("event_type")
        .agg(pick(25, "p25"), pick(50, "p50"), pick(75, "p75"), pick(95, "p95"))
        .orderBy("event_type")
    )


@register(
    "agg_weighted_avg_exact",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                        * CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
                   AS wsum_fp,
               CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
                   AS wtotal,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                        * CAST(FLOOR(l_quantity) AS BIGINT)) AS DOUBLE)
                   / (100 * SUM(CAST(FLOOR(l_quantity) AS BIGINT)))
                   AS weighted_avg_price
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("relational", "agg", "fixed-point"),
)
def agg_weighted_avg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag in exact
    arithmetic: Σ(price_fp·qty) / Σqty as integer sums with ONE final
    float division — the only engine-portable way to weighted-average
    doubles (naive SUM(price*qty) is order-dependent float summation).
    Price scales at 100 and integral quantities keep the per-row
    product ≤ ~5e9, so BIGINT sums hold exactly past sf100; the
    weighted mean itself is a single correctly-rounded IEEE division
    on both engines.

    Scale shape: plain one-shuffle aggregation with map-side partial
    integer sums — identical cost to an unweighted SUM/GROUP BY."""
    li = load_table(spark, sf_dir, "lineitem")
    price_fp = F.floor(F.col("l_extendedprice") * 100).cast("long")
    qty = F.floor(F.col("l_quantity")).cast("long")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(price_fp * qty).alias("wsum_fp"),
            F.sum(qty).alias("wtotal"),
            (
                F.sum(price_fp * qty).cast("double")
                / (100 * F.sum(qty))
            ).alias("weighted_avg_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_bitwise_battery",
    oracle="""
        SELECT o_orderpriority,
               CAST(bit_and(o_orderkey) AS BIGINT) AS key_and,
               CAST(bit_or(o_orderkey) AS BIGINT) AS key_or,
               CAST(bit_xor(o_orderkey) AS BIGINT) AS key_xor,
               CAST(bit_xor(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                                 AS BIGINT)) AS BIGINT) AS md5_xor_checksum
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("relational", "agg", "bitwise"),
)
def agg_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate battery (AND/OR/XOR) per order priority,
    plus an order-independent md5-XOR set checksum — the anti-entropy
    primitive that detects membership drift between replicas without
    sorting (XOR is commutative/associative, so partial aggregation
    in any partition order yields the same digest; 60-bit md5 prefix
    keeps the value positive BIGINT on both engines).

    Scale shape: one map-side-combined shuffle; the checksum variant
    is what table_fingerprint's Merkle leaves reduce to when page
    structure isn't needed."""
    o = load_table(spark, sf_dir, "orders")
    md5_60 = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.bit_and("o_orderkey").alias("key_and"),
            F.bit_or("o_orderkey").alias("key_or"),
            F.bit_xor("o_orderkey").alias("key_xor"),
            F.bit_xor(md5_60).alias("md5_xor_checksum"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "window_ratio_to_report",
    oracle="""
        WITH rev AS (
            SELECT r.r_name AS region, n.n_name AS nation,
                   SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT)) AS rev_fp
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n ON c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2
        )
        SELECT region, nation,
               CAST(rev_fp AS DOUBLE) / 10000 AS revenue,
               CAST(rev_fp AS DOUBLE)
                   / CAST(sum(rev_fp) OVER (PARTITION BY region) AS DOUBLE)
                   AS region_share
        FROM rev ORDER BY region, nation
    """,
    tags=("relational", "window", "ratio"),
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's revenue —
    the windowed x/Σx pattern behind every contribution/mix report.
    Numerator and denominator are both exact fixed-point BIGINT sums;
    the share is ONE double division of two integers, identical on
    both engines (cross-row float summation never happens).

    Scale shape: the star join broadcasts all dimensions; one shuffle
    produces the (region, nation) aggregate — bounded at |nations| —
    and the share window runs on that tiny relation, not on facts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("rev_fp")
        )
    )
    wreg = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        (F.col("rev_fp").cast("double") / 10000).alias("revenue"),
        (
            F.col("rev_fp").cast("double")
            / F.sum("rev_fp").over(wreg).cast("double")
        ).alias("region_share"),
    ).orderBy("region", "nation")


@register(
    "orders_seasonality_matrix",
    oracle="""
        SELECT CAST(strftime(o_orderdate, '%m') AS BIGINT) AS month,
               CAST(strftime(o_orderdate, '%w') AS BIGINT) AS weekday,
               count(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT))
                    AS DOUBLE) / 10000 AS total_value
        FROM orders
        GROUP BY 1, 2 ORDER BY month, weekday
    """,
    tags=("relational", "time", "seasonality"),
)
def orders_seasonality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month × weekday seasonality matrix of order volume and value —
    the calendar-feature table behind demand forecasting and
    anomaly baselining.  Weekday uses the 0=Sunday convention on both
    engines (Spark dayofweek−1 == DuckDB strftime %w); sums are
    fixed-point exact.

    Scale shape: single map-side-combined aggregation bounded at
    12×7 output groups regardless of table size."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.month("o_orderdate").cast("long").alias("month"),
            (F.dayofweek("o_orderdate") - 1).cast("long").alias("weekday"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.floor(F.col("o_totalprice") * 10000).cast("long")).cast(
                    "double"
                )
                / 10000
            ).alias("total_value"),
        )
        .orderBy("month", "weekday")
    )


@register(
    "orders_cohort_ltv_triangle",
    oracle="""
        WITH first_order AS (
            SELECT o_custkey AS cust,
                   min(strftime(o_orderdate, '%Y')) AS cohort_year
            FROM orders GROUP BY o_custkey
        )
        SELECT f.cohort_year,
               CAST(strftime(o.o_orderdate, '%Y') AS BIGINT)
                   - CAST(f.cohort_year AS BIGINT) AS year_offset,
               count(DISTINCT o.o_custkey) AS n_active_customers,
               count(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 10000) AS BIGINT))
                    AS DOUBLE) / 10000 AS cohort_value
        FROM orders o JOIN first_order f ON f.cust = o.o_custkey
        GROUP BY 1, 2 ORDER BY cohort_year, year_offset
    """,
    tags=("relational", "cohort", "ltv"),
)
def orders_cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value triangle: acquisition-year cohorts ×
    years-since-acquisition, with active customers, order counts and
    exact fixed-point cohort revenue — the finance-side companion to
    events_retention_cohort (which counts activity, not value).  The
    triangle's diagonal decay is the standard LTV forecasting input.

    Scale shape: the cohort dimension derives from a per-customer min
    (one custkey shuffle) and re-joins orders on the same key — one
    row per customer, unbounded at scale, so no broadcast hint: the
    shuffled join reuses the aggregation's custkey partitioning and
    AQE broadcasts only when the side is actually small. The triangle
    rollup is bounded at years² groups."""
    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.min(F.date_format("o_orderdate", "yyyy")).alias("cohort_year")
    )
    return (
        o.join(first, o.o_custkey == first.cust)
        .groupBy(
            "cohort_year",
            (
                F.date_format("o_orderdate", "yyyy").cast("long")
                - F.col("cohort_year").cast("long")
            ).alias("year_offset"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_active_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.floor(F.col("o_totalprice") * 10000).cast("long")).cast(
                    "double"
                )
                / 10000
            ).alias("cohort_value"),
        )
        .orderBy("cohort_year", "year_offset")
    )


@register(
    "supplier_market_concentration",
    oracle="""
        WITH rev AS (
            SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
                   SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT)) AS rev_fp
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2
        ),
        shares AS (
            SELECT nk, sk,
                   CAST((rev_fp * 10000)
                       // CAST(sum(rev_fp) OVER (PARTITION BY nk) AS BIGINT)
                       AS BIGINT) AS share_bp
            FROM rev
        )
        SELECT n.n_name AS nation,
               count(*) AS n_suppliers,
               CAST(sum(share_bp * share_bp) AS BIGINT) AS hhi_bp2,
               max(share_bp) AS top_share_bp
        FROM shares JOIN nation n ON n.n_nationkey = shares.nk
        GROUP BY n.n_name ORDER BY nation
    """,
    tags=("relational", "statistics", "concentration"),
)
def supplier_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman market-concentration index per supplier
    nation: each supplier's revenue share in basis points (integer
    division against the exact fixed-point nation total), HHI as the
    integer sum of squared shares (10000 bp² = monopoly) plus the top
    share — the skew/concentration audit for marketplaces, and the
    same math that flags hot-key concentration in a shuffle.

    Scale shape: one (nation, supplier) aggregation with map-side
    combine, a nation-partitioned share window on the supplier-sized
    rollup, and a |nations| final rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nk"), F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("rev_fp")
        )
    )
    wn = Window.partitionBy("nk")
    shares = rev.select(
        "nk",
        F.expr("(rev_fp * 10000) div sum(rev_fp) over (partition by nk)").alias(
            "share_bp"
        ),
    )
    return (
        shares.join(F.broadcast(n), shares.nk == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("share_bp") * F.col("share_bp"))
            .cast("long")
            .alias("hhi_bp2"),
            F.max("share_bp").alias("top_share_bp"),
        )
        .orderBy("nation")
    )


@register(
    "scalar_struct_ops",
    oracle="""
        WITH s AS (
            SELECT n_nationkey,
                   struct_pack(name := n_name, region := n_regionkey) AS st
            FROM nation
        )
        SELECT n_nationkey,
               st.name AS nation_name,
               CAST(st.region AS BIGINT) AS region_key,
               struct_pack(k := n_nationkey,
                           inner := struct_pack(twice := n_nationkey * 2))
                   .inner.twice AS nested_twice,
               len([st.name, st.name]) AS arr_of_struct_len
        FROM s
        ORDER BY n_nationkey
    """,
    tags=("relational", "scalar", "struct"),
)
def scalar_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct scalar battery: construction (named_struct), dot-path
    field access, two-level nesting, and arrays of structs —
    completing the nested-type scalar surface next to
    scalar_array_ops / scalar_map_ops.  Nested access compiles to
    zero-cost column pruning in both engines (no shuffle, no
    materialization of the outer struct).

    Scale shape: pure per-row projection inside whole-stage codegen;
    struct columns prune field-wise at the parquet reader, so reading
    one field of a 50-field struct scans one column chunk."""
    n = load_table(spark, sf_dir, "nation")
    st = F.struct(
        F.col("n_name").alias("name"), F.col("n_regionkey").alias("region")
    )
    nested = F.struct(
        F.col("n_nationkey").alias("k"),
        F.struct((F.col("n_nationkey") * 2).alias("twice")).alias("inner"),
    )
    return (
        n.select(
            "n_nationkey",
            st.alias("st"),
            nested.getField("inner").getField("twice").alias("nested_twice"),
        )
        .select(
            "n_nationkey",
            F.col("st.name").alias("nation_name"),
            F.col("st.region").cast("long").alias("region_key"),
            "nested_twice",
            F.size(F.array(F.col("st.name"), F.col("st.name"))).alias(
                "arr_of_struct_len"
            ),
        )
        .orderBy("n_nationkey")
    )


@register(
    "mv_incremental_refresh",
    oracle="""
        SELECT n.n_name AS nation,
               count(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 10000) AS BIGINT))
                    AS DOUBLE) / 10000 AS total_value
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY nation
    """,
    tags=("relational", "materialized-view", "incremental"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance, verified against
    full recompute: the nation-revenue MV is built from the BASE
    partition (even orderkeys), a DELTA batch (odd orderkeys) is
    aggregated separately, and the refresh merges the two partial
    aggregates with a full-outer join + coalesced sums — the
    algebraic identity (SUM/COUNT decompose over partitions) that
    lets a warehouse maintain an aggregate MV by touching only the
    delta.  The oracle computes the same MV from scratch over all
    rows, so the check proves merge == recompute — the strategy-level
    verification, same pattern as hierarchy_depth_rollup's recursive
    oracle.

    Scale shape: the delta path aggregates ONLY the new batch (delta-
    sized shuffle) and merges into the |nations|-sized MV — at 100 TB
    that's the difference between scanning a day's partition and
    re-scanning years; count/sum/min/max all merge this way, while
    AVG must be stored as (sum, count) and DISTINCT needs a sketch or
    a re-aggregable key table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "o_orderkey",
            F.col("n_name").alias("nation"),
            F.floor(F.col("o_totalprice") * 10000).cast("long").alias("v_fp"),
        )
        .persist()  # split into base/delta below
    )

    def agg(df: DataFrame, n_col: str, v_col: str) -> DataFrame:
        return df.groupBy("nation").agg(
            F.count(F.lit(1)).alias(n_col), F.sum("v_fp").alias(v_col)
        )

    base = agg(joined.filter(F.col("o_orderkey") % 2 == 0), "n_b", "v_b")
    delta = agg(joined.filter(F.col("o_orderkey") % 2 == 1), "n_d", "v_d")
    merged = (
        base.withColumnRenamed("nation", "nation_b")
        .join(
            delta.withColumnRenamed("nation", "nation_d"),
            F.col("nation_b") == F.col("nation_d"),
            "full_outer",
        )
        .select(
            F.coalesce("nation_b", "nation_d").alias("nation"),
            (F.coalesce("n_b", F.lit(0)) + F.coalesce("n_d", F.lit(0))).alias(
                "n_orders"
            ),
            (
                (
                    F.coalesce("v_b", F.lit(0)) + F.coalesce("v_d", F.lit(0))
                ).cast("double")
                / 10000
            ).alias("total_value"),
        )
    )
    return merged.orderBy("nation")


@register(
    "corpus_shard_manifest",
    oracle=f"""
        WITH sized AS (
            SELECT doc_id, n_chars, md5(text) AS checksum,
                   len({SQL_TOKENS}) AS n_tok
            FROM documents
        ),
        assigned AS (
            SELECT doc_id, n_chars, checksum,
                   CAST((row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1)
                        % {N_SHARDS} AS BIGINT) AS shard
            FROM sized
        ),
        placed AS (
            SELECT shard, doc_id, checksum, n_chars,
                   row_number() OVER (PARTITION BY shard ORDER BY doc_id)
                       AS position
            FROM assigned
        )
        SELECT shard, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_bytes,
               md5(string_agg(checksum, '' ORDER BY position))
                   AS manifest_digest
        FROM placed GROUP BY shard ORDER BY shard
    """,
    tags=("llm-data", "sharding", "manifest", "integrity"),
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest: documents assigned to
    size-balanced shards (corpus_shard_assignment's LPT round-robin),
    laid out in doc_id order within each shard, with the per-shard
    byte total and an ORDER-SENSITIVE manifest digest (md5 of the
    concatenated per-doc md5s in layout order) — the integrity
    artifact a training job checks before streaming a shard, which
    catches reordering and truncation, not just content corruption.
    Spark has no ordered string_agg, so the digest is built from
    array_sort over (position, checksum) structs — deterministic
    regardless of partitioning.

    Scale shape: the global size rank uses the skew-free bucketed
    cumsum of ``operators/deskew`` (bit-identical to the window
    formulation — round 5 removed the one-task whole-corpus sort);
    then one shard-partitioned layout sort and an 8-group rollup;
    checksums are map-side."""
    from kafkastreamer_spark.operators.deskew import (  # noqa: PLC0415
        bucketed_row_number,
    )

    d = widen(load_table(spark, sf_dir, "documents"))
    sized = d.select(
        "doc_id",
        "n_chars",
        F.md5("text").alias("checksum"),
        F.size(tokens(F.col("text"))).alias("n_tok"),
    )
    ranked = bucketed_row_number(
        sized,
        [],
        F.floor(F.col("n_tok") / 16).cast("long"),
        [F.desc("n_tok"), F.asc("doc_id")],
        "_rn",
        bucket_desc=True,
    )
    assigned = ranked.select(
        "doc_id",
        "n_chars",
        "checksum",
        ((F.col("_rn") - 1) % N_SHARDS).cast("long").alias("shard"),
    )
    wpos = Window.partitionBy("shard").orderBy("doc_id")
    placed = assigned.select(
        "shard",
        "checksum",
        "n_chars",
        F.row_number().over(wpos).alias("position"),
    )
    ordered_digest = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("position", "checksum"))),
                lambda s: s.checksum,
            ),
            "",
        )
    )
    return (
        placed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_bytes"),
            ordered_digest.alias("manifest_digest"),
        )
        .orderBy("shard")
    )


@register(
    "agg_boolean_battery",
    oracle="""
        SELECT l_returnflag,
               CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
               bool_and(l_extendedprice > 0) AS all_priced,
               bool_or(l_discount > 0.09) AS any_deep_discount,
               CAST(count(*) FILTER (WHERE l_tax = 0) AS BIGINT) AS n_tax_free
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("relational", "agg", "boolean"),
)
def agg_boolean_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-aggregate battery per return flag: count_if,
    bool_and/bool_or (every/any), and FILTERed counts — the
    predicate-summary surface (data-quality booleans compile to
    exactly these).  Every aggregate here decomposes for map-side
    partial aggregation, so the shuffle carries one boolean/long per
    group per agg.

    Scale shape: single map-side-combined aggregation; predicates
    evaluate inside codegen on the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
            F.bool_and(F.col("l_extendedprice") > 0).alias("all_priced"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
            F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_tax_free"),
        )
        .orderBy("l_returnflag")
    )


_ECDF_PROBES = (50, 100, 150, 200, 250)


@register(
    "events_value_ecdf",
    oracle=f"""
        WITH n AS (SELECT count(*) AS total FROM events)
        SELECT probe,
               CAST(count(*) FILTER (WHERE value <= probe) AS BIGINT) AS n_le,
               (SELECT total FROM n) AS n_total,
               CAST(count(*) FILTER (WHERE value <= probe) AS DOUBLE)
                   / (SELECT total FROM n) AS ecdf
        FROM events, (SELECT unnest([{", ".join(str(p) for p in _ECDF_PROBES)}])
                      AS probe)
        GROUP BY probe ORDER BY probe
    """,
    tags=("relational", "statistics", "distribution"),
)
def events_value_ecdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical CDF of event values at fixed probe points — the
    inverse view of the percentile battery (percentiles answer
    "what value sits at p?"; the eCDF answers "what fraction sits
    below v?"), used for threshold calibration and as the
    fixed-abscissa distribution fingerprint two snapshots can be
    compared on.  Counts are exact integers; each eCDF value is one
    final division.

    Scale shape: the probe fan-out is a 5× map-side row multiply
    folded into ONE aggregation pass (conditional counts per probe) —
    not five scans; at 100 TB this is a single shuffle of 5 groups."""
    ev = load_table(spark, sf_dir, "events")
    nt = ev.agg(F.count(F.lit(1)).alias("n_total"))
    probes = ev.select(
        "value",
        F.explode(F.array(*[F.lit(p) for p in _ECDF_PROBES])).alias("probe"),
    )
    return (
        probes.groupBy("probe")
        .agg(F.count_if(F.col("value") <= F.col("probe")).alias("n_le"))
        .crossJoin(F.broadcast(nt))
        .select(
            "probe",
            "n_le",
            "n_total",
            (F.col("n_le").cast("double") / F.col("n_total")).alias("ecdf"),
        )
        .orderBy("probe")
    )


@register(
    "orders_monthly_yoy_growth",
    oracle="""
        WITH m AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   count(*) AS n_orders,
                   SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT)) AS rev_fp
            FROM orders GROUP BY 1
        )
        SELECT month, n_orders,
               CAST(rev_fp AS DOUBLE) / 10000 AS revenue,
               n_orders - LAG(n_orders, 12) OVER (ORDER BY month) AS yoy_n_delta,
               CAST(rev_fp - LAG(rev_fp, 12) OVER (ORDER BY month) AS DOUBLE)
                   / 10000 AS yoy_rev_delta,
               CAST(CASE WHEN LAG(rev_fp, 12) OVER (ORDER BY month) > 0
                    THEN (rev_fp * 10000) // LAG(rev_fp, 12) OVER (ORDER BY month)
                    END AS BIGINT) AS yoy_rev_ratio_bp
        FROM m ORDER BY month
    """,
    tags=("relational", "time", "growth", "window"),
)
def orders_monthly_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-same-month-last-year growth: LAG(12) on the
    monthly rollup for order-count and revenue deltas plus the YoY
    ratio in integer basis points — the seasonality-adjusted growth
    view (plain MoM deltas confound seasonality;
    events_daily_delta's day lag is the intra-month sibling).

    Scale shape: one calendar-bounded monthly aggregation; the LAG-12
    window runs on ≤ hundreds of rows."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 10000).cast("long")).alias("rev_fp"),
    )
    w = Window.orderBy("month")
    prev = F.lag("rev_fp", 12).over(w)
    return m.select(
        "month",
        "n_orders",
        (F.col("rev_fp").cast("double") / 10000).alias("revenue"),
        (F.col("n_orders") - F.lag("n_orders", 12).over(w)).alias("yoy_n_delta"),
        ((F.col("rev_fp") - prev).cast("double") / 10000).alias("yoy_rev_delta"),
        F.when(prev > 0, F.expr(
            "(rev_fp * 10000) div lag(rev_fp, 12) over (order by month)"
        )).alias("yoy_rev_ratio_bp"),
    ).orderBy("month")


@register(
    "customer_revenue_gini",
    oracle="""
        WITH rev AS (
            SELECT o_custkey,
                   SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT)) AS r_fp
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT r_fp,
                   row_number() OVER (ORDER BY r_fp, o_custkey) AS i,
                   count(*) OVER () AS n
            FROM rev
        )
        SELECT CAST(min(n) AS BIGINT) AS n_customers,
               CAST(sum(r_fp) AS BIGINT) AS total_fp,
               CAST(sum(i * r_fp) AS BIGINT) AS weighted_fp,
               CAST(2 * sum(i * r_fp) - (min(n) + 1) * sum(r_fp) AS DOUBLE)
                   / (min(n) * sum(r_fp)) AS gini
        FROM ranked
    """,
    tags=("relational", "statistics", "inequality"),
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the inequality summary
    next to ABC-Pareto (which buckets) and HHI (which squares
    shares): G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over
    ascending-sorted revenues.  Both sums are exact integers (ranks ×
    fixed-point revenues), so the only float op is the final
    division — the formula's subtraction happens in integer space
    where cancellation is harmless.

    Scale shape: one custkey rollup, one global ascending rank (the
    honest serial step — at extreme n swap for repartitionByRange +
    per-partition offsets exactly as corpus_shard_assignment
    documents), one scalar aggregate."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 10000).cast("long")).alias("r_fp")
    )
    w = Window.orderBy("r_fp", "o_custkey")
    ranked = rev.select(
        "r_fp",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.min("n").cast("long").alias("n_customers"),
        F.sum("r_fp").cast("long").alias("total_fp"),
        F.sum(F.col("i") * F.col("r_fp")).cast("long").alias("weighted_fp"),
        (
            (
                2 * F.sum(F.col("i") * F.col("r_fp"))
                - (F.min("n") + 1) * F.sum("r_fp")
            ).cast("double")
            / (F.min("n") * F.sum("r_fp"))
        ).alias("gini"),
    )


@register(
    "supplier_lead_time_profile",
    oracle="""
        WITH lt AS (
            SELECT l.l_suppkey AS sk,
                   date_diff('day', o.o_orderdate, l.l_shipdate) AS lead_days,
                   l.l_orderkey, l.l_linenumber
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        ranked AS (
            SELECT sk, lead_days,
                   row_number() OVER (PARTITION BY sk
                                      ORDER BY lead_days, l_orderkey,
                                               l_linenumber) AS rn,
                   count(*) OVER (PARTITION BY sk) AS cnt
            FROM lt
        )
        SELECT s.s_name AS supplier,
               CAST(min(r.cnt) AS BIGINT) AS n_shipments,
               min(r.lead_days) AS min_days,
               max(r.lead_days) AS max_days,
               CAST(sum(r.lead_days) AS BIGINT) AS total_days,
               max(CASE WHEN r.rn = (r.cnt * 90 + 99) // 100
                        THEN r.lead_days END) AS p90_days
        FROM ranked r JOIN supplier s ON s.s_suppkey = r.sk
        GROUP BY s.s_name ORDER BY supplier
    """,
    tags=("relational", "supply-chain", "percentile", "time"),
)
def supplier_lead_time_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier order-to-ship lead-time profile: min/max/total
    days plus the discrete p90 (rank formula from
    agg_percentile_disc_battery) — the supplier-SLA scorecard.
    Day differences are exact integers on both engines (Spark
    datediff == DuckDB date_diff('day') for timestamp-at-midnight
    fixtures), so even the percentile needs no float anywhere.

    Scale shape: the fact join shuffles once on orderkey; the rank
    runs partitioned by supplier (bounded groups), and the rollup is
    map-side combined with the supplier dimension broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    lt = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("sk"),
        F.datediff("l_shipdate", "o_orderdate").alias("lead_days"),
        "l_orderkey",
        "l_linenumber",
    )
    wr = Window.partitionBy("sk").orderBy("lead_days", "l_orderkey", "l_linenumber")
    wc = Window.partitionBy("sk")
    ranked = lt.select(
        "sk",
        "lead_days",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return (
        ranked.join(F.broadcast(s), ranked.sk == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(
            F.min("cnt").cast("long").alias("n_shipments"),
            F.min("lead_days").alias("min_days"),
            F.max("lead_days").alias("max_days"),
            F.sum("lead_days").cast("long").alias("total_days"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(cnt * 90 + 99) div 100"),
                    F.col("lead_days"),
                )
            ).alias("p90_days"),
        )
        .orderBy("supplier")
    )


@register(
    "orders_lines_histogram",
    oracle="""
        WITH per_order AS (
            SELECT l_orderkey, count(*) AS n_lines
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT n_lines, count(*) AS n_orders,
               CAST(n_lines * count(*) AS BIGINT) AS n_lineitems
        FROM per_order GROUP BY n_lines ORDER BY n_lines
    """,
    tags=("relational", "distribution"),
)
def orders_lines_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-size distribution: how many orders have k line items —
    the fan-out profile that sizes the orders⋈lineitem join's
    per-key amplification (a fat tail here is join-skew warning
    exactly like events_partition_skew_report's bucket view).

    Scale shape: two map-side-combined aggregations, output bounded
    by max lines per order (7 in TPC-H)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        per_order.groupBy("n_lines")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "n_lines",
            "n_orders",
            (F.col("n_lines") * F.col("n_orders")).cast("long").alias("n_lineitems"),
        )
        .orderBy("n_lines")
    )


# The same SQL TEXT serves as both the Spark implementation (via
# kafkastreamer_spark.sql.run_sql) and the DuckDB oracle — these two
# queries prove the engine's SQL-string door produces gate-identical
# results in the ANSI subset both engines share.
_SHARED_SQL_ROLLUP = """
    SELECT r_name AS region, COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT)) AS DOUBLE)
               / 10000 AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY region
"""

_SHARED_SQL_RANKED = """
    SELECT o_orderpriority AS priority, COUNT(*) AS n,
           CAST(RANK() OVER (ORDER BY COUNT(*) DESC, o_orderpriority)
                AS BIGINT) AS rnk
    FROM orders GROUP BY o_orderpriority ORDER BY rnk, priority
"""


@register(
    "sql_text_shared_dialect_rollup",
    oracle=_SHARED_SQL_ROLLUP,
    tags=("sql-surface", "relational", "agg"),
)
def sql_text_shared_dialect_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-string surface proof, aggregate form: the implementation
    is LITERALLY the oracle string, executed through
    ``kafkastreamer_spark.sql.run_sql`` (fixture tables registered as
    temp views, Catalyst planning the text exactly like the
    DataFrame API) — one ANSI string, two engines, gate-identical
    results.  Demonstrates users can bring raw SQL to the engine
    without the DataFrame layer and keep every determinism guarantee,
    provided they stay in the shared dialect and fixed-point
    discipline.

    Scale shape: identical to window_ratio_to_report's star join —
    Catalyst broadcasts the dimensions regardless of which surface
    submitted the text."""
    from kafkastreamer_spark.sql import run_sql

    return run_sql(spark, sf_dir, _SHARED_SQL_ROLLUP)


@register(
    "sql_text_shared_dialect_ranked",
    oracle=_SHARED_SQL_RANKED,
    tags=("sql-surface", "relational", "window"),
)
def sql_text_shared_dialect_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-string surface proof, window form: RANK over a grouped
    aggregate from one shared-dialect string (see
    sql_text_shared_dialect_rollup)."""
    from kafkastreamer_spark.sql import run_sql

    return run_sql(spark, sf_dir, _SHARED_SQL_RANKED)


@register(
    "subquery_exists_battery",
    oracle="""
        SELECT 'customers_with_orders' AS probe,
               (SELECT count(*) FROM customer c
                WHERE EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)) AS n
        UNION ALL
        SELECT 'customers_without_orders',
               (SELECT count(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_custkey = c.c_custkey))
        UNION ALL
        SELECT 'customers_via_in',
               (SELECT count(*) FROM customer
                WHERE c_custkey IN (SELECT o_custkey FROM orders))
        UNION ALL
        SELECT 'orders_above_cust_avg',
               (SELECT count(*) FROM orders o
                WHERE CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) * (
                          SELECT count(*) FROM orders i
                          WHERE i.o_custkey = o.o_custkey)
                      > (SELECT SUM(CAST(FLOOR(i.o_totalprice * 100) AS BIGINT))
                         FROM orders i WHERE i.o_custkey = o.o_custkey))
        ORDER BY probe
    """,
    tags=("relational", "subquery", "correlated"),
)
def subquery_exists_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery battery: EXISTS (semi), NOT EXISTS (anti),
    IN (semi again — the count must equal the EXISTS form), and a
    correlated above-the-customer's-average probe done in exact
    integer cross-multiplication (price·n > Σprice avoids the float
    average entirely).  Catalyst decorrelates all four into
    semi/anti/aggregate joins — the battery pins that rewrite's
    semantics, including the equal counts between the IN and EXISTS
    spellings.

    Scale shape: each probe is one semi/anti join (broadcast when the
    dimension fits) or one custkey-grouped aggregate joined back —
    nothing row-at-a-time despite the correlated spelling."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    def one(name: str, n) -> DataFrame:
        return n.select(F.lit(name).alias("probe"), F.col("n").cast("long").alias("n"))

    with_orders = c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).agg(F.count(F.lit(1)).alias("n"))
    without_orders = c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("n"))
    via_in = c.join(
        o.select("o_custkey").distinct(),
        c.c_custkey == F.col("o_custkey"),
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("tot_fp"),
    )
    above_avg = (
        # no broadcast hint: stats is one row per customer (unbounded
        # at scale); the shuffled join reuses the custkey partitioning
        o.join(stats, o.o_custkey == stats.k)
        .filter(
            F.floor(F.col("o_totalprice") * 100).cast("long") * F.col("cnt")
            > F.col("tot_fp")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        one("customers_via_in", via_in)
        .unionByName(one("customers_with_orders", with_orders))
        .unionByName(one("customers_without_orders", without_orders))
        .unionByName(one("orders_above_cust_avg", above_avg))
        .orderBy("probe")
    )


@register(
    "features_customer_matrix",
    oracle="""
        WITH stats AS (
            SELECT o_custkey AS custkey,
                   count(*) AS frequency,
                   SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT)) AS monetary_fp,
                   min(o_orderdate) AS first_order,
                   max(o_orderdate) AS last_order,
                   count(DISTINCT o_orderpriority) AS n_priorities,
                   CAST(max(CAST(FLOOR(o_totalprice * 10000) AS BIGINT))
                        AS BIGINT) AS max_order_fp
            FROM orders GROUP BY o_custkey
        ),
        anchor AS (SELECT max(o_orderdate) AS now FROM orders)
        SELECT custkey,
               date_diff('day', last_order, (SELECT now FROM anchor))
                   AS recency_days,
               frequency,
               CAST(monetary_fp AS DOUBLE) / 10000 AS monetary,
               CAST(n_priorities AS BIGINT) AS n_priorities,
               CAST(max_order_fp AS DOUBLE) / 10000 AS max_order_value,
               date_diff('day', first_order, last_order) AS tenure_days,
               CASE WHEN frequency > 1
                    THEN date_diff('day', first_order, last_order)
                         // (frequency - 1) END AS mean_gap_days
        FROM stats
        ORDER BY custkey
    """,
    tags=("relational", "feature-engineering", "ml"),
)
def features_customer_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer feature matrix for churn/CLV models: recency against
    the corpus anchor date, frequency, exact monetary totals, max
    order value, priority diversity, tenure, and mean inter-order
    gap as integer division of day spans (no float averaging) — the
    feature-engineering rollup that feeds a training table, with
    every column exact so train/serve skew from the FEATURE layer is
    zero by construction (the point-in-time discipline is
    features_point_in_time_join; this is the aggregate-feature
    sibling).

    Scale shape: ONE custkey-grouped pass builds every feature
    (count/sum/min/max/distinct all map-side combinable); the anchor
    date broadcasts.  Adding features widens the aggregate, never
    adds passes."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("now"))
    stats = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.floor(F.col("o_totalprice") * 10000).cast("long")).alias(
            "monetary_fp"
        ),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.countDistinct("o_orderpriority").cast("long").alias("n_priorities"),
        F.max(F.floor(F.col("o_totalprice") * 10000).cast("long")).alias(
            "max_order_fp"
        ),
    )
    return (
        stats.crossJoin(F.broadcast(anchor))
        .select(
            "custkey",
            F.datediff("now", "last_order").alias("recency_days"),
            "frequency",
            (F.col("monetary_fp").cast("double") / 10000).alias("monetary"),
            "n_priorities",
            (F.col("max_order_fp").cast("double") / 10000).alias("max_order_value"),
            F.datediff("last_order", "first_order").alias("tenure_days"),
            F.when(
                F.col("frequency") > 1,
                F.expr("datediff(last_order, first_order) div (frequency - 1)"),
            ).alias("mean_gap_days"),
        )
        .orderBy("custkey")
    )


@register(
    "scalar_array_zip_battery",
    oracle="""
        WITH base AS (
            SELECT n_nationkey,
                   list_transform(range(1, 4), i -> n_nationkey * i) AS a,
                   list_transform(range(1, 4), i -> i * i) AS b
            FROM nation
        )
        SELECT n_nationkey,
               list_transform(range(1, 4), i -> a[i] + b[i]) AS zipped_sum,
               CAST(list_sum(list_transform(range(1, 4), i -> a[i] * b[i]))
                    AS BIGINT) AS dot_int,
               list_transform(range(1, 4),
                              i -> CAST(a[i] AS VARCHAR) || ':'
                                   || CAST(b[i] AS VARCHAR)) AS paired
        FROM base ORDER BY n_nationkey
    """,
    tags=("relational", "scalar", "array", "zip"),
)
def scalar_array_zip_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-zip battery: element-wise combination of two derived
    integer arrays — zip_with sums, an integer dot product via
    aggregate-over-zip (the same fold the embedding family relies
    on, here in pure integers), and a paired string rendering —
    completing the nested-array surface next to scalar_array_ops.

    Scale shape: pure per-row codegen array work, no shuffle."""
    n = load_table(spark, sf_dir, "nation")
    idx = F.sequence(F.lit(1), F.lit(3))
    base = n.select(
        "n_nationkey",
        F.transform(idx, lambda i: F.col("n_nationkey") * i).alias("a"),
        F.transform(idx, lambda i: i * i).alias("b"),
    )
    return base.select(
        "n_nationkey",
        F.zip_with("a", "b", lambda x, y: x + y).alias("zipped_sum"),
        F.aggregate(
            F.zip_with("a", "b", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot_int"),
        F.zip_with(
            "a",
            "b",
            lambda x, y: F.concat(x.cast("string"), F.lit(":"), y.cast("string")),
        ).alias("paired"),
    ).orderBy("n_nationkey")
