"""Round-11 batch 245: diversity/outlier statistics in exact fixed
point, ML precision-recall deciles, data-governance erasure
accounting, Allen interval-relation profiling, and ANALYZE-style
column statistics.

* ``events_type_simpson_diversity`` — per-user Simpson diversity of
  event types (1 - Σp², exact fixed point — the diversity index that
  needs no logarithm, chosen over Shannon precisely so the oracle is
  bit-exact), rolled into a decile histogram.
* ``ml_pr_curve_deciles`` — the precision-recall curve of the shared
  per-user click-score model at each score-decile cutoff.
* ``gdpr_erasure_audit`` — right-to-be-forgotten impact accounting:
  rows per table (events, orders, lineitem-via-cascade, customer)
  that a deterministic deleted-subject list would erase.
* ``join_allen_relations`` — Allen-style interval relations between
  consecutive order intervals per customer (precedes / meets /
  overlaps / finished-by / contains / starts / started_by / equals
  ladder).
* ``stats_column_profile`` — ANALYZE-style ndv / null / min / max
  profile of lineitem's integer key columns.
* ``events_value_iqr_outliers`` — Tukey-fence outlier counts per
  event type with exact discrete quartiles on integer cents (fences
  doubled to stay in integers: 2q1 - 3IQR, 2q3 + 3IQR).

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B closure
plus data-governance accounting for training pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.queries.relational16 import _PER_USER_SQL, _per_user
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# events_type_simpson_diversity
# ---------------------------------------------------------------------------


@register(
    "events_type_simpson_diversity",
    oracle="""
        WITH per AS (
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        u AS (
            SELECT user_id,
                   CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(c * c) AS BIGINT) AS s2
            FROM per GROUP BY 1
        ),
        d AS (
            SELECT user_id,
                   10000 - (s2 * 10000) // (n * n) AS simpson4
            FROM u
        )
        SELECT simpson4 // 1000 AS decile,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(min(simpson4) AS BIGINT) AS min_simpson4,
               CAST(max(simpson4) AS BIGINT) AS max_simpson4
        FROM d GROUP BY 1 ORDER BY 1
    """,
    tags=("events", "diversity", "statistics"),
)
def events_type_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Simpson diversity of event types — 1 - Σ(c/n)² as
    exact fixed point (simpson4 = 10000 - Σc²*10000 div n²), bucketed
    into a decile histogram. Simpson is chosen over Shannon entropy
    deliberately: it needs only integer squares and one division, so
    both engines hash identically — a log-based index cannot be made
    bit-exact across engines.

    Scale shape: two map-side-combining aggregations (user x type,
    then user), then a bounded 11-bucket histogram.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    u = per.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    d = u.select(
        F.expr("10000 - (s2 * 10000) div (n * n)").alias("simpson4")
    )
    return (
        d.groupBy(F.expr("simpson4 div 1000").alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.min("simpson4").cast("long").alias("min_simpson4"),
            F.max("simpson4").cast("long").alias("max_simpson4"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# ml_pr_curve_deciles
# ---------------------------------------------------------------------------


@register(
    "ml_pr_curve_deciles",
    oracle=f"""
        WITH per_user AS ({_PER_USER_SQL}),
        ranked AS (
            SELECT y,
                   ROW_NUMBER() OVER (ORDER BY score DESC, user_id) AS rn
            FROM per_user
        ),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS pos
            FROM ranked
        ),
        dec AS (SELECT unnest(range(1, 11)) AS d)
        SELECT dec.d AS decile,
               CAST(count_if(ranked.rn <= (dec.d * agg.n) // 10)
                    AS BIGINT) AS n_predicted,
               CAST(count_if(ranked.rn <= (dec.d * agg.n) // 10
                             AND ranked.y = 1) AS BIGINT) AS n_tp,
               (count_if(ranked.rn <= (dec.d * agg.n) // 10
                         AND ranked.y = 1) * 10000)
                   // ((dec.d * agg.n) // 10) AS precision4,
               (count_if(ranked.rn <= (dec.d * agg.n) // 10
                         AND ranked.y = 1) * 10000)
                   // agg.pos AS recall4
        FROM ranked CROSS JOIN agg CROSS JOIN dec
        GROUP BY 1, agg.n, agg.pos ORDER BY 1
    """,
    tags=("ml", "evaluation", "pr-curve"),
)
def ml_pr_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve of the shared per-user click-score model
    (relational16's _per_user) at each score-decile cutoff: treating
    the top d*10% (score desc, user_id tie-break) as predicted
    positive, exact fixed-point precision4/recall4 — the threshold
    picker next to ml_auc_* and ml_gains_table_deciles.

    Scale shape: like the gains table, the only global window runs
    over one row per user (the derived small relation), and the 10
    cutoffs evaluate via conditional sums in ONE pass.
    """
    pu = _per_user(spark, sf_dir)
    ranked = pu.select(
        "y",
        F.row_number().over(Window.orderBy(F.desc("score"), "user_id")).alias(
            "rn"
        ),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    dec = spark.createDataFrame([(d,) for d in range(1, 11)], "d long")
    rows = ranked.crossJoin(F.broadcast(agg)).crossJoin(F.broadcast(dec))
    in_cut = F.col("rn") <= F.expr("(d * n) div 10")
    return (
        rows.groupBy(F.col("d").alias("decile"), "n", "pos")
        .agg(
            F.sum(F.when(in_cut, 1).otherwise(0))
            .cast("long")
            .alias("n_predicted"),
            F.sum(F.when(in_cut & (F.col("y") == 1), 1).otherwise(0))
            .cast("long")
            .alias("n_tp"),
        )
        .select(
            "decile",
            "n_predicted",
            "n_tp",
            F.expr("(n_tp * 10000) div ((decile * n) div 10)").alias(
                "precision4"
            ),
            F.expr("(n_tp * 10000) div pos").alias("recall4"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# gdpr_erasure_audit
# ---------------------------------------------------------------------------

_ERASE_MOD = 97  # deterministic deleted-subject list: key % 97 == 0


@register(
    "gdpr_erasure_audit",
    oracle=f"""
        WITH e AS (
            SELECT 'events' AS tbl,
                   CAST(count_if(user_id % {_ERASE_MOD} = 0) AS BIGINT)
                       AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_total
            FROM events
        ),
        c AS (
            SELECT 'customer' AS tbl,
                   CAST(count_if(c_custkey % {_ERASE_MOD} = 0) AS BIGINT),
                   CAST(count(*) AS BIGINT)
            FROM customer
        ),
        o AS (
            SELECT 'orders' AS tbl,
                   CAST(count_if(o_custkey % {_ERASE_MOD} = 0) AS BIGINT),
                   CAST(count(*) AS BIGINT)
            FROM orders
        ),
        l AS (
            SELECT 'lineitem' AS tbl,
                   CAST(count_if(oo.o_custkey % {_ERASE_MOD} = 0) AS BIGINT),
                   CAST(count(*) AS BIGINT)
            FROM lineitem li JOIN orders oo ON li.l_orderkey = oo.o_orderkey
        ),
        allt AS (
            SELECT * FROM e UNION ALL SELECT * FROM c
            UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l
        )
        SELECT tbl, n_rows, n_total,
               (n_rows * 10000) // n_total AS share4
        FROM allt ORDER BY tbl
    """,
    tags=("governance", "gdpr", "accounting"),
)
def gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact accounting: for a deterministic
    deleted-subject list (key % 97 == 0 — stand-in for the erasure
    queue), the rows each table would lose, INCLUDING the cascade
    through orders into lineitem (lineitem has no customer key — the
    erasure set propagates through the foreign-key join, which is the
    part naive per-table scans miss).

    Scale shape: three conditional single-pass aggregations plus one
    fact-to-fact equi-join for the cascade; output is 4 rows.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = widen(load_table(spark, sf_dir, "lineitem"))

    def prof(df, tbl, cond):
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )

    e = prof(ev, "events", F.col("user_id") % _ERASE_MOD == 0)
    c = prof(cu, "customer", F.col("c_custkey") % _ERASE_MOD == 0)
    oo = prof(o, "orders", F.col("o_custkey") % _ERASE_MOD == 0)
    lj = li.join(
        o.select("o_orderkey", "o_custkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    ll = prof(lj, "lineitem", F.col("o_custkey") % _ERASE_MOD == 0)
    allt = e.unionByName(c).unionByName(oo).unionByName(ll)
    return allt.select(
        "tbl",
        "n_rows",
        "n_total",
        F.expr("(n_rows * 10000) div n_total").alias("share4"),
    ).orderBy("tbl")


# ---------------------------------------------------------------------------
# join_allen_relations
# ---------------------------------------------------------------------------

# shared CASE ladder over (prev_start ps, prev_end pe, start s, end e)
# with ps <= s guaranteed by the lag ordering; first match wins
_ALLEN_CASE = """
    CASE
        WHEN pe < s THEN 'precedes'
        WHEN pe = s THEN 'meets'
        WHEN ps = s AND pe = e THEN 'equals'
        WHEN ps = s AND pe < e THEN 'starts'
        WHEN ps = s AND pe > e THEN 'started_by'
        WHEN pe = e THEN 'finished_by'
        WHEN pe > e THEN 'contains'
        ELSE 'overlaps'
    END
"""


@register(
    "join_allen_relations",
    oracle=f"""
        WITH closed AS (
            SELECT o.o_custkey, o.o_orderkey, o.o_orderdate AS s0,
                   max(l.l_shipdate) AS e0
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2, 3
        ),
        seq AS (
            SELECT s0 AS s, e0 AS e,
                   LAG(s0) OVER w AS ps,
                   LAG(e0) OVER w AS pe
            FROM closed
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY s0, o_orderkey)
        )
        SELECT {_ALLEN_CASE} AS relation,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM seq WHERE ps IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """,
    tags=("orders", "temporal", "interval", "allen"),
)
def join_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen-style interval-relation profile between CONSECUTIVE order
    intervals per customer (interval = order placement to last
    lineitem shipment): precedes / meets / overlaps / finished-by /
    contains / starts / started-by / equals, with ps <= s guaranteed
    by the lag ordering so the 13-relation algebra folds to this
    8-arm ladder. The profile answers "do this customer's orders
    pipeline or overlap?" — the interval-join shape at survey scale.

    Scale shape: one order-grain aggregation, one per-customer LAG
    window, one bounded 8-row rollup.
    """
    o = widen(load_table(spark, sf_dir, "orders"))
    li = load_table(spark, sf_dir, "lineitem")
    closed = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("e0"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_custkey", "o_orderkey", F.col("o_orderdate").alias("s0"), "e0"
        )
    )
    w = Window.partitionBy("o_custkey").orderBy("s0", "o_orderkey")
    seq = closed.select(
        F.col("s0").alias("s"),
        F.col("e0").alias("e"),
        F.lag("s0").over(w).alias("ps"),
        F.lag("e0").over(w).alias("pe"),
    ).filter(F.col("ps").isNotNull())
    return (
        seq.groupBy(F.expr(_ALLEN_CASE).alias("relation"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("relation")
    )


# ---------------------------------------------------------------------------
# stats_column_profile
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")


@register(
    "stats_column_profile",
    oracle=f"""
        {" UNION ALL ".join(
            f'''SELECT '{c}' AS col_name,
                   CAST(count(DISTINCT {c}) AS BIGINT) AS ndv,
                   CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
                   CAST(min({c}) AS BIGINT) AS min_v,
                   CAST(max({c}) AS BIGINT) AS max_v
            FROM lineitem''' for c in _PROFILE_COLS)}
        ORDER BY col_name
    """,
    tags=("stats", "catalog", "profile"),
)
def stats_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-TABLE-style exact column statistics for lineitem's
    integer key columns: distinct count, null count, min, max — the
    numbers a cost-based optimizer's stats collection materializes
    (exact here; the sketch family covers the approx variants).

    Scale shape: one pass per column with map-side partial
    aggregation; at 100 TB this is the ANALYZE job and parallelizes
    per column.
    """
    li = widen(load_table(spark, sf_dir, "lineitem"))
    parts = [
        li.agg(
            F.lit(c).alias("col_name"),
            F.count_distinct(F.col(c)).cast("long").alias("ndv"),
            (F.count(F.lit(1)) - F.count(F.col(c)))
            .cast("long")
            .alias("n_nulls"),
            F.min(F.col(c)).cast("long").alias("min_v"),
            F.max(F.col(c)).cast("long").alias("max_v"),
        )
        for c in _PROFILE_COLS
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return allp.orderBy("col_name")


# ---------------------------------------------------------------------------
# events_value_iqr_outliers
# ---------------------------------------------------------------------------


@register(
    "events_value_iqr_outliers",
    oracle="""
        WITH cents AS (
            SELECT event_type, event_id,
                   CAST(floor(value * 100) AS BIGINT) AS c
            FROM events
        ),
        ranked AS (
            SELECT event_type, c,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY c, event_id) AS rn,
                   CAST(count(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n
            FROM cents
        ),
        q AS (
            SELECT event_type, n,
                   max(CASE WHEN rn = (n + 3) // 4 THEN c END) AS q1_c,
                   max(CASE WHEN rn = (3 * n + 3) // 4 THEN c END) AS q3_c
            FROM ranked GROUP BY 1, 2
        )
        SELECT r.event_type, q.n AS n_values, q.q1_c, q.q3_c,
               CAST(count_if(2 * r.c < 2 * q.q1_c - 3 * (q.q3_c - q.q1_c)
                          OR 2 * r.c > 2 * q.q3_c + 3 * (q.q3_c - q.q1_c))
                    AS BIGINT) AS n_outliers
        FROM ranked r JOIN q ON q.event_type = r.event_type
        GROUP BY 1, 2, 3, 4 ORDER BY 1
    """,
    tags=("events", "statistics", "outliers"),
)
def events_value_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per event type on exact integer
    cents: discrete quartiles q1/q3 at ranks ceil(n/4) and ceil(3n/4)
    (percentile_disc semantics, (event_id)-tie-broken), fences
    computed at DOUBLED scale (2q1 - 3·IQR, 2q3 + 3·IQR) so the
    1.5×IQR rule stays in integers end to end.

    Scale shape: one per-type rank window, the quartile lookup is a
    filter on two ranks, and the outlier count joins the bounded
    per-type quartile table back with a broadcast.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    cents = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("c"),
    )
    wr = Window.partitionBy("event_type").orderBy("c", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = cents.select(
        "event_type",
        "c",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    q = (
        ranked.groupBy("event_type", "n")
        .agg(
            F.max(
                F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("c"))
            ).alias("q1_c"),
            F.max(
                F.when(F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("c"))
            ).alias("q3_c"),
        )
        .withColumnRenamed("n", "n_values")
    )
    return (
        ranked.select("event_type", "c")
        .join(F.broadcast(q), "event_type")
        .groupBy("event_type", "n_values", "q1_c", "q3_c")
        .agg(
            F.sum(
                F.when(
                    (2 * F.col("c") < 2 * F.col("q1_c") - 3 * (F.col("q3_c") - F.col("q1_c")))
                    | (2 * F.col("c") > 2 * F.col("q3_c") + 3 * (F.col("q3_c") - F.col("q1_c"))),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .orderBy("event_type")
    )
