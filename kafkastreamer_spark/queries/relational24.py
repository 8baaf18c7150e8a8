"""Round-9 batch 233: cohort LTV triangle, funnel attribution-window
ladder, top-k heavy-hitter churn.

* ``orders_cohort_ltv_curve`` — the classic cohort-LTV triangle:
  customers cohorted by first-order month, cumulative revenue per
  months-since-first offset — the revenue companion of
  events_retention_cohort's count triangle, exact in fixed point.
* ``events_funnel_window_ladder`` — funnel conversion as a FUNCTION
  of the attribution window (1h / 6h / 24h): the sensitivity table
  behind every "conversion rate" number, complementing
  events_funnel_latency_quartiles (which fixes the pairing and
  profiles latency; this fixes nothing and profiles the window).
* ``events_topk_churn`` — day-over-day turnover of the daily top-20
  heaviest users: how stable the heavy-hitter set is, the ops metric
  that decides whether per-entity throttles/caches can be sticky.

Reference parity note: the reference engine computes nothing of this
kind (keyed integer streamer, v1/src/main/java/Stream/Streamer.java);
these belong to the SURVEY §2 Part-B analytics closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.queries._util import SCALE, fixed
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table

# ---------------------------------------------------------------------------
# orders_cohort_ltv_curve
# ---------------------------------------------------------------------------

_LTV_MAX_OFFSET = 11  # first 12 columns of the triangle


@register(
    "orders_cohort_ltv_curve",
    oracle=f"""
        WITH firsts AS (
            SELECT o_custkey,
                   min(date_trunc('month', o_orderdate)) AS cohort_month
            FROM orders GROUP BY o_custkey
        ),
        rev AS (
            SELECT f.cohort_month,
                   (CAST(date_part('year', o.o_orderdate) AS BIGINT) * 12
                    + CAST(date_part('month', o.o_orderdate) AS BIGINT))
                   - (CAST(date_part('year', f.cohort_month) AS BIGINT) * 12
                      + CAST(date_part('month', f.cohort_month) AS BIGINT))
                       AS offset_m,
                   CAST(FLOOR(o.o_totalprice * {SCALE}) AS BIGINT) AS rev4
            FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
        ),
        cells AS (
            SELECT cohort_month, offset_m,
                   CAST(sum(rev4) AS BIGINT) AS rev4,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM rev WHERE offset_m <= {_LTV_MAX_OFFSET}
            GROUP BY cohort_month, offset_m
        ),
        sizes AS (
            SELECT cohort_month, CAST(count(*) AS BIGINT) AS cohort_size
            FROM firsts GROUP BY cohort_month
        )
        SELECT strftime(c.cohort_month, '%Y-%m') AS cohort,
               c.offset_m, s.cohort_size, c.n_orders,
               CAST(sum(c.rev4) OVER (
                    PARTITION BY c.cohort_month ORDER BY c.offset_m
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_rev4,
               CAST(sum(c.rev4) OVER (
                    PARTITION BY c.cohort_month ORDER BY c.offset_m
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) // s.cohort_size AS BIGINT) AS cum_ltv4_per_customer
        FROM cells c JOIN sizes s ON s.cohort_month = c.cohort_month
        ORDER BY cohort, offset_m
    """,
    tags=("orders", "cohort", "analytics"),
)
def orders_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers cohort by their
    first-order month; each (cohort, months-since-first) cell carries
    order count and the cohort's CUMULATIVE revenue (fixed-point) and
    per-customer LTV — offsets 0..{_LTV_MAX_OFFSET}. Reading down a
    column compares cohort quality at equal age, the curve every
    acquisition-spend decision reads; the revenue companion of
    events_retention_cohort.

    Scale shape: first-order months are one groupBy over orders; the
    cohort join keys on o_custkey (hash-partitioned both sides); cells
    partial-aggregate map-side to a calendar-bounded triangle
    (|months| x {_LTV_MAX_OFFSET + 1} rows) BEFORE the cumulative
    window, which therefore sorts only the tiny triangle — the
    calendar-bounded-series discipline of events_ewma_halflife.
    """
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    mnum = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate")
        - (F.year("cohort_month") * 12 + F.month("cohort_month"))
    ).cast("long")
    rev = o.join(firsts, "o_custkey").select(
        "cohort_month",
        mnum.alias("offset_m"),
        fixed("o_totalprice").alias("rev4"),
    )
    cells = (
        rev.filter(F.col("offset_m") <= _LTV_MAX_OFFSET)
        .groupBy("cohort_month", "offset_m")
        .agg(
            F.sum("rev4").cast("long").alias("rev4"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
    sizes = firsts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("offset_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = cells.join(sizes, "cohort_month").withColumn(
        "cum_rev4", F.sum("rev4").over(w).cast("long")
    )
    return joined.select(
        F.date_format("cohort_month", "yyyy-MM").alias("cohort"),
        "offset_m",
        "cohort_size",
        "n_orders",
        "cum_rev4",
        F.expr("cum_rev4 div cohort_size").cast("long").alias(
            "cum_ltv4_per_customer"
        ),
    ).orderBy("cohort", "offset_m")


# ---------------------------------------------------------------------------
# events_funnel_window_ladder
# ---------------------------------------------------------------------------

_FUNNEL_WINDOWS_S = (3600, 21600, 86400)  # 1h / 6h / 24h
_FUNNEL_A = "view"
_FUNNEL_B = "purchase"


def funnel_ladder_from_latencies(lat: DataFrame) -> DataFrame:
    """Shared tail of the funnel ladder: from per-entry next-conversion
    latencies ``(event_id, lat_us nullable)`` to the per-window
    conversion table. Used by the batch query AND the streaming twin's
    parity test (streaming/funnel.py) so the two forms share one
    aggregation, the events_wau_sliding discipline."""
    ladder = lat.select(
        "event_id",
        "lat_us",
        F.explode(
            F.array(*[F.lit(w).cast("long") for w in _FUNNEL_WINDOWS_S])
        ).alias("w_s"),
    )
    conv = ladder.select(
        "w_s",
        F.when(
            F.col("lat_us").isNotNull()
            & (F.col("lat_us") <= F.col("w_s") * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("converted"),
    )
    return (
        conv.groupBy(F.col("w_s").cast("long").alias("window_s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_entries"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.expr("(sum(converted) * 10000) div count(*)")
            .cast("long")
            .alias("conversion4"),
        )
        .orderBy("window_s")
    )


@register(
    "events_funnel_window_ladder",
    oracle=f"""
        WITH a AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = '{_FUNNEL_A}'
        ),
        b AS (
            SELECT user_id, ts FROM events
            WHERE event_type = '{_FUNNEL_B}'
        ),
        ws AS (SELECT unnest([{", ".join(str(w) for w in _FUNNEL_WINDOWS_S)}])
                   AS w_s),
        conv AS (
            SELECT ws.w_s, a.event_id,
                   CASE WHEN EXISTS (
                       SELECT 1 FROM b
                       WHERE b.user_id = a.user_id
                         AND b.ts > a.ts
                         AND epoch_us(b.ts) - epoch_us(a.ts)
                             <= CAST(ws.w_s AS BIGINT) * 1000000
                   ) THEN 1 ELSE 0 END AS converted
            FROM a CROSS JOIN ws
        )
        SELECT CAST(w_s AS BIGINT) AS window_s,
               CAST(count(*) AS BIGINT) AS n_entries,
               CAST(sum(converted) AS BIGINT) AS n_converted,
               CAST((sum(converted) * 10000) // count(*) AS BIGINT)
                   AS conversion4
        FROM conv GROUP BY w_s ORDER BY window_s
    """,
    tags=("events", "funnel", "attribution"),
)
def events_funnel_window_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion ({_FUNNEL_A} -> {_FUNNEL_B}) as a function
    of the attribution window: for each window in 1h / 6h / 24h, the
    share of entry events followed by a conversion from the same user
    within the window. The ladder IS the sensitivity analysis every
    reported conversion rate needs — a rate that doubles between 1h
    and 24h is measuring user patience, not funnel quality.
    Complements events_funnel_latency_quartiles (fixed pairing,
    latency profile) and events_purchase_attribution (credit
    assignment).

    Scale shape: entries and conversions shuffle ONCE on user_id as a
    single tagged pass; all {len(_FUNNEL_WINDOWS_S)} windows read off
    one next-conversion latency per entry, computed as a running min
    over the strictly-later window frame (never a per-user pair join,
    never a per-window re-join); the ladder explode happens on the
    bounded per-entry result. Global rollup is count-only.
    """
    # r13 (guide §2.4/§3.4): the previous form left-joined entries to
    # conversions on user_id (per-user pair blowup: every view × every
    # purchase of that user), aggregated the pairs back down, then
    # joined AGAIN to restore entries whose only matches were filtered
    # out. The next-conversion-after-each-entry lookup is a windowed
    # running min over ONE tagged pass: union both event types, sort
    # per user by microsecond timestamp, and take min(purchase ts)
    # over the strictly-later frame RANGE (1 FOLLOWING, UNBOUNDED
    # FOLLOWING) — integer micros make "strictly greater" exactly
    # "≥ cur+1", matching the oracle's b.ts > a.ts. One events scan
    # and one user_id exchange; no join, no restore pass, no pair
    # explosion at any scale.
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(
        F.col("event_type").isin(_FUNNEL_A, _FUNNEL_B)
    ).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        (F.col("event_type") == _FUNNEL_B).alias("is_b"),
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    next_b_us = F.min(F.when(F.col("is_b"), F.col("us"))).over(w_next)
    lat = (
        tagged.withColumn("lat_us", next_b_us - F.col("us"))
        .filter(~F.col("is_b"))
        .select("event_id", "lat_us")
    )
    return funnel_ladder_from_latencies(lat)


# ---------------------------------------------------------------------------
# events_topk_churn
# ---------------------------------------------------------------------------

_CHURN_K = 20


@register(
    "events_topk_churn",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, user_id,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT day, user_id,
                   row_number() OVER (PARTITION BY day
                                      ORDER BY c DESC, user_id) AS rnk
            FROM daily
        ),
        topk AS (SELECT day, user_id FROM ranked WHERE rnk <= {_CHURN_K}),
        days AS (SELECT DISTINCT day FROM topk),
        pairs AS (
            SELECT d.day,
                   lag(d.day) OVER (ORDER BY d.day) AS prev_day
            FROM days d
        ),
        overlap AS (
            SELECT p.day, p.prev_day,
                   CAST((SELECT count(*) FROM topk t1
                         JOIN topk t2 ON t2.user_id = t1.user_id
                         WHERE t1.day = p.day AND t2.day = p.prev_day)
                        AS BIGINT) AS n_common
            FROM pairs p WHERE p.prev_day IS NOT NULL
        ),
        ksz AS (
            SELECT day, CAST(count(*) AS BIGINT) AS k_sz
            FROM topk GROUP BY day
        )
        SELECT strftime(o.day, '%Y-%m-%d') AS day, n_common,
               CAST(k.k_sz - n_common AS BIGINT) AS n_new,
               CAST((n_common * 10000) // k.k_sz AS BIGINT)
                   AS stability4
        FROM overlap o JOIN ksz k ON k.day = o.day ORDER BY day
    """,
    tags=("events", "heavy-hitters", "ops"),
)
def events_topk_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day churn of the daily top-{_CHURN_K} heaviest users:
    per day, how many of the top-{_CHURN_K} were also in yesterday's
    set, the turnover, and the stability ratio — n_new and the
    stability denominator use the day's ACTUAL top-k set size (< K on
    days with fewer than K active users), not the nominal K, so thin
    days are not overstated as churn. Sticky heavy hitters
    justify per-entity caches/throttles with long TTLs; a set that
    churns daily does not — the ops decision this table answers,
    complementing events_sliding_topk_trending (which tracks WHAT is
    trending, not how stable the top set is).

    Scale shape: daily per-user counts partial-aggregate map-side;
    the per-day top-k is a day-partitioned rank over those partials
    (bounded by users x days, never raw events); each day's set then
    collapses to one ≤{_CHURN_K}-element array row and the
    consecutive-day overlap is a single lag window + array_intersect
    over the days-count-sized relation — no self-join.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "user_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return churn_from_daily(daily)


def churn_from_daily(daily: DataFrame) -> DataFrame:
    """Shared tail of the top-k churn table: from per-(day, user)
    activity counts ``(day date, user_id, c)`` to the day-over-day
    overlap report. Used by the batch query AND the streaming twin's
    parity test (streaming/topk_churn.py), the
    funnel_ladder_from_latencies discipline."""
    # r13 (guide §2.4): the previous form persisted the top-k set and
    # referenced it FOUR times (days-distinct, both sides of the shift
    # join, and the k_sz aggregate) — three joins and ~17 exchanges to
    # compare consecutive days' sets. Collapse each day's top-k to ONE
    # row (collect_set of its ≤K user ids — already day-partitioned by
    # the rank window, so the groupBy adds no exchange) and take the
    # previous day's set with a single lag window; the overlap is then
    # size(array_intersect(...)) per row. Identical output: user_id is
    # unique within a day's top-k, so the intersect size equals the old
    # shift-join match count, size(users) is the old k_sz, and days
    # with zero overlap yield 0 directly (the old left-join coalesce).
    w = Window.partitionBy("day").orderBy(F.desc("c"), "user_id")
    day_sets = (
        daily.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _CHURN_K)
        .groupBy("day")
        .agg(F.collect_set("user_id").alias("users"))
    )
    shifted = day_sets.select(
        "day",
        "users",
        F.lag("users").over(Window.orderBy("day")).alias("prev_users"),
    ).filter(F.col("prev_users").isNotNull())
    return (
        shifted.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.size(F.array_intersect("users", "prev_users"))
            .cast("long")
            .alias("n_common"),
            F.size("users").cast("long").alias("k_sz"),
        )
        .select(
            "day",
            "n_common",
            (F.col("k_sz") - F.col("n_common")).cast("long").alias("n_new"),
            F.expr("(n_common * 10000) div k_sz").cast("long").alias("stability4"),
        )
        .orderBy("day")
    )
