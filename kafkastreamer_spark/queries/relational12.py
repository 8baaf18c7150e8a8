"""Round-4 batch: scale-safe plan variants for the operators the
round-3 verdict flagged as plan-quality weak spots.

The reference has no relational surface (its operators are the keyed
arithmetic stages, Streamer.java:443-466); these entries close the
engine's OWN scale gaps:

* ``agg_equidepth_histogram_sampled`` — the companion to
  ``agg_equidepth_histogram`` (queries/events.py) without its
  ``Exchange SinglePartition`` + single-task global sort.  Despite the
  name (kept from the round-3 verdict item), the variant is EXACT, not
  sampled: each row's global rank is computed with the two-phase
  bucketed cumsum of ``operators/deskew.bucketed_row_number`` (range
  buckets on the sort-key prefix are order-preserving, so the rank is
  bit-identical to the single-window formulation), and the ntile bin
  falls out of the rank in closed form.  Same oracle as the exact
  variant — stronger than the tolerance-style oracle the verdict asked
  for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators.deskew import bucketed_row_number
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table

# Range-bucket width for the o_totalprice global rank. o_totalprice
# spans ~[850, 560k] in the TPC-H-ish fixture, so 4096-wide buckets
# give ~140 sort partitions at any SF; at 100 TB you'd shrink the
# width (the counts table stays tiny — it is |buckets| rows).
_PRICE_BUCKET_W = 4096


@register(
    "agg_equidepth_histogram_sampled",
    oracle="""
        WITH binned AS (
            SELECT o_totalprice,
                   ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
            FROM orders
        )
        SELECT bin, count(*) AS n,
               min(o_totalprice) AS lo, max(o_totalprice) AS hi
        FROM binned GROUP BY bin ORDER BY bin
    """,
    tags=("aggregate", "histogram", "statistics", "deskew"),
)
def agg_equidepth_histogram_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram WITHOUT the global single-task sort: the
    scale-safe twin of ``agg_equidepth_histogram`` (the round-3
    verdict's #1 item — the last ``Exchange SinglePartition`` plan in
    the registry).

    ``ntile(10) OVER (ORDER BY price, key)`` is just a closed-form
    function of the row's global rank r in that total order::

        base = N div 10;  rem = N mod 10;  cutoff = rem * (base+1)
        bin  = (r-1) div (base+1) + 1                       if r <= cutoff
             = rem + (r - cutoff - 1) div base + 1          otherwise

    so the only hard part is the exact global rank — which
    ``bucketed_row_number`` computes skew-free: range-bucket the rows
    by ``floor(price / W)`` (monotone in the sort-key prefix, so
    (bucket, price, key) orders identically to (price, key)), count
    rows per bucket with an ordinary map-side-combining aggregate,
    prefix-sum the tiny |buckets|-row counts table into rank offsets,
    and add a per-bucket local ``row_number``.  The heaviest sort task
    holds one price range, not the table; the result is bit-identical
    to the ntile formulation (same oracle as the exact variant — no
    tolerance needed).

    Plan-asserted in tests/test_equidepth_scalable.py: the de-skew
    bucket column is present and no ntile / whole-table window
    remains."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked = bucketed_row_number(
        o,
        [],
        F.floor(F.col("o_totalprice") / _PRICE_BUCKET_W).cast("long"),
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        "r",
        count_name="N",
    )
    binned = ranked.select(
        "o_totalprice",
        F.expr(
            """
            CASE WHEN r <= (N % 10) * (N div 10 + 1)
                 THEN (r - 1) div (N div 10 + 1) + 1
                 ELSE (N % 10) + (r - (N % 10) * (N div 10 + 1) - 1)
                                  div (N div 10) + 1
            END
            """
        ).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .select(F.col("bin").cast("long").alias("bin"), "n", "lo", "hi")
        .orderBy("bin")
    )


@register(
    "relational_unpivot",
    oracle="""
        WITH wide AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   count(*) AS n_orders,
                   count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                       AS n_urgent,
                   CAST(sum(CAST(floor(o_totalprice * 10000) AS BIGINT))
                        AS BIGINT) AS rev4
            FROM orders GROUP BY 1
        )
        SELECT month, metric, value
        FROM wide UNPIVOT (value FOR metric IN (n_orders, n_urgent, rev4))
        ORDER BY month, metric
    """,
    tags=("relational", "reshape", "unpivot"),
)
def relational_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — the inverse of events_type_pivot, closing the
    reshape pair: a wide per-month metrics row becomes (month, metric,
    value) long form via ``stack`` (Spark's UNPIVOT primitive, a
    map-only Generate — no shuffle beyond the feeding aggregate).

    Scale shape: the aggregate collapses orders to |months| rows
    map-side; the stack then triples a tiny frame. Metric values share
    one BIGINT type (counts + fixed-point revenue), the UNPIVOT
    type-unification rule both engines enforce."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias(
            "n_urgent"
        ),
        F.sum(F.floor(F.col("o_totalprice") * 10000).cast("long"))
        .cast("long")
        .alias("rev4"),
    )
    return (
        wide.select(
            "month",
            F.expr(
                "stack(3, 'n_orders', n_orders, 'n_urgent', n_urgent,"
                " 'rev4', rev4) AS (metric, value)"
            ),
        )
        .orderBy("month", "metric")
    )


@register(
    "events_gaps_islands",
    oracle="""
        WITH du AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ),
        anchored AS (
            SELECT user_id, d,
                   d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                            AS INTEGER) AS anchor
            FROM du
        ),
        islands AS (
            SELECT user_id, min(d) AS island_start, max(d) AS island_end,
                   count(*) AS n_days
            FROM anchored GROUP BY user_id, anchor
        )
        SELECT user_id, strftime(island_start, '%Y-%m-%d') AS island_start,
               strftime(island_end, '%Y-%m-%d') AS island_end, n_days
        FROM islands
        WHERE n_days >= 3
        ORDER BY user_id, island_start
    """,
    tags=("events", "window", "gaps-islands"),
)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per
    user (islands of ≥3 days) — the classic SQL streak/retention
    pattern (login streaks, uptime stretches, continuous-coverage
    intervals). The island anchor is ``day - row_number()``: constant
    within a consecutive run, strictly decreasing across a gap.

    Scale shape: raw events first collapse to DISTINCT (user, day)
    pairs (map-side partial), so the per-user window sorts at most
    |calendar days| rows per user — state bounded by the horizon, not
    event volume; the island aggregate reuses the same (user) shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    du = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    anchored = du.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return (
        anchored.groupBy("user_id", "anchor")
        .agg(
            F.min("d").alias("s"),
            F.max("d").alias("e"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .filter(F.col("n_days") >= 3)
        .select(
            "user_id",
            F.date_format("s", "yyyy-MM-dd").alias("island_start"),
            F.date_format("e", "yyyy-MM-dd").alias("island_end"),
            "n_days",
        )
        .orderBy("user_id", "island_start")
    )


@register(
    "agg_ols_trend",
    oracle="""
        WITH daily AS (
            SELECT o_orderpriority AS priority,
                   date_diff('day', DATE '1992-01-01', o_orderdate) AS x,
                   CAST(floor(sum(o_totalprice)) AS BIGINT) AS y
            FROM orders GROUP BY 1, 2
        ),
        sums AS (
            SELECT priority,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM daily GROUP BY 1
        )
        SELECT priority, n,
               CAST(floor(10000 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                    AS BIGINT) AS slope4,
               CAST(floor(10000 * (CAST(sy AS DOUBLE)
                         - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                           * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
                    AS BIGINT) AS icept4,
               CAST(floor(10000 * ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                                   * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
                    / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                       * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
                    AS BIGINT) AS r2_4
        FROM sums ORDER BY priority
    """,
    tags=("aggregate", "regression", "statistics"),
)
def agg_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend line — regr_slope / regr_intercept / R²
    re-derived from exact integer moment sums, because the native
    regression aggregates accumulate doubles in partial-aggregation
    order (engine-dependent last bits). Daily revenue (whole currency
    units, BIGINT) regresses on the day index x = days since
    1992-01-01; all five moment sums (Σx Σy Σxy Σx² Σy²) are exact
    BIGINTs (bounds checked: y ≤ ~1e6/day, x ≤ ~2500 ⇒ Σy² ≤ ~2e15),
    and only the final slope/intercept/R² arithmetic runs in doubles —
    each operation a correctly-rounded IEEE op both engines perform
    identically, then fixed-point-floored.

    Scale shape: two map-side-combinable aggregates (orders → daily,
    daily → 5 moment rows); nothing else shuffles. This is the
    map-reduce formulation every distributed regression uses — the
    moments are the sufficient statistics."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")).alias("x"),
    ).agg(F.floor(F.sum("o_totalprice")).cast("long").alias("y"))
    x, y = F.col("x").cast("long"), F.col("y")
    sums = daily.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * y).cast("long").alias("sxy"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(y * y).cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov = nd * F.col("sxy") - sxd * F.col("sy")
    varx = nd * F.col("sxx") - sxd * F.col("sx")
    vary = nd * F.col("syy") - syd * F.col("sy")
    slope = cov / varx
    return sums.select(
        "priority",
        "n",
        F.floor(10000 * slope).cast("long").alias("slope4"),
        F.floor(10000 * (syd - slope * sxd) / nd).cast("long").alias("icept4"),
        F.floor(10000 * (cov * cov) / (varx * vary)).cast("long").alias("r2_4"),
    ).orderBy("priority")


@register(
    "events_top_paths",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type AS t1,
                   lead(event_type, 1) OVER w AS t2,
                   lead(event_type, 2) OVER w AS t3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT t1 || '>' || t2 || '>' || t3 AS path,
               count(*) AS n
        FROM seq WHERE t3 IS NOT NULL
        GROUP BY 1
        ORDER BY n DESC, path
        LIMIT 20
    """,
    tags=("events", "sequence-mining", "window"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step behavioral paths across user timelines — the
    k-gram generalization of events_markov_transitions (first-order
    pairs): two LEADs over the per-user (ts, event_id) order emit
    every consecutive type triple, counted and ranked. The
    path-frequency table behind funnel discovery and next-action
    models.

    Scale shape: one shuffle on user_id for the window (per-user
    partitions bounded by per-user event counts), then the count is
    map-side-combining on |types|³ keys and top-20 compiles to
    TakeOrderedAndProject — no global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        seq.groupBy(
            F.concat_ws(">", "t1", "t2", "t3").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


@register(
    "events_ewma_halflife",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT event_type, day, c,
                   CAST(row_number() OVER (PARTITION BY event_type
                                           ORDER BY day) AS BIGINT) - 1 AS i
            FROM daily
        ),
        acc AS (
            SELECT event_type, day, c, i,
                   sum(c * (CAST(1 AS BIGINT) << i)) OVER (
                       PARTITION BY event_type ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum
            FROM idx
        )
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day, c,
               CAST(floor(10000 * (CAST(cum AS DOUBLE)
                    / CAST(CAST(1 AS BIGINT) << i AS DOUBLE))) AS BIGINT)
                   AS ewma4
        FROM acc ORDER BY event_type, day
    """,
    tags=("events", "time-series", "window"),
)
def events_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event counts
    with half-life one day (α = 1/2) — the smoothing primitive behind
    alerting baselines and trend dashboards, usually impossible to
    oracle-check exactly because exp/pow differ across libms. α = 1/2
    makes every term a dyadic rational: ewma_n · 2ⁿ = Σ cᵢ·2ⁱ, an
    exact BIGINT running sum (cᵢ ≤ ~2¹³ per day, i < ~30 days ⇒ < 2⁴⁴,
    no overflow), and the final cum / 2ⁱ is an exact power-of-two
    division — bit-identical in both engines with zero transcendental
    calls (2ⁱ is a shift, not pow()).

    Scale shape: raw events collapse to |types|×|days| daily rows
    map-side; only those tiny partials feed the per-type ordered
    window. The 2ⁱ trick caps the horizon at ~50 days of BIGINT
    headroom per series; a production rollout re-anchors i per
    ~40-day block (ewma carrying over as the block seed) — same
    plan, windowed anchor."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wi = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn(
        "i", (F.row_number().over(wi) - 1).cast("long")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    acc = idx.withColumn(
        "cum",
        F.sum(F.expr("c * shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))")).over(wc),
    )
    return acc.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "c",
        F.floor(
            10000
            * (
                F.col("cum").cast("double")
                / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)) AS DOUBLE)")
            )
        )
        .cast("long")
        .alias("ewma4"),
    ).orderBy("event_type", "day")
