"""Round-12 batch 247: matched-ranks testing, cross-fold model
stability, survey estimator auditing, and forecast-accuracy
backtesting.

* ``stats_friedman_test`` — Friedman's matched k-sample rank test
  over per-user (click, purchase, error) activity counts: the
  rank-valued companion of stats_cochran_q (same blocks, counts
  instead of binary flags), tie-corrected, exact fixed point.
* ``ml_auc_fold_stability`` — exact Mann-Whitney AUC of the shared
  click-propensity model per md5-assigned fold, plus the cross-fold
  spread — the "is the AUC one lucky split" check next to
  ml_auc_bootstrap_ci (resampling) and ml_kfold assignments.
* ``sample_ratio_estimator_audit`` — expansion vs ratio estimation
  of total lineitem revenue from a deterministic 10% order sample,
  both audited against the exact total: the measured
  variance-reduction case for using a known auxiliary total.
* ``orders_forecast_mase_backtest`` — MASE (mean absolute scaled
  error) of the seasonal-naive monthly revenue forecast against the
  naive benchmark — the scale-free forecast-accuracy number the
  Croston/seasonal entries report errors in.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B statistics /
ML-evaluation / ops closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.queries.relational16 import _PER_USER_SQL, _per_user
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# stats_friedman_test
# ---------------------------------------------------------------------------

_F_TYPES = ("click", "purchase", "error")

# doubled average rank of value x among the block's three values:
# 2*(#strictly-less) + (#equal-others) + 2 — integer-exact average
# ranks without a window (ties of 3 values resolve to halves, so
# DOUBLED ranks stay integers; e.g. (2,2,1) ranks (2.5, 2.5, 1) →
# d = (5, 5, 2))
def _sql_d(j: int) -> str:
    others = [i for i in (1, 2, 3) if i != j]
    less = " + ".join(f"CASE WHEN c{i} < c{j} THEN 1 ELSE 0 END" for i in others)
    eq = " + ".join(f"CASE WHEN c{i} = c{j} THEN 1 ELSE 0 END" for i in others)
    return f"(2 * ({less}) + ({eq}) + 2)"


@register(
    "stats_friedman_test",
    oracle=f"""
        WITH blocks AS (
            SELECT user_id,
                   CAST(count_if(event_type = '{_F_TYPES[0]}') AS BIGINT) AS c1,
                   CAST(count_if(event_type = '{_F_TYPES[1]}') AS BIGINT) AS c2,
                   CAST(count_if(event_type = '{_F_TYPES[2]}') AS BIGINT) AS c3
            FROM events GROUP BY user_id
        ),
        ranked AS (
            SELECT {_sql_d(1)} AS d1, {_sql_d(2)} AS d2, {_sql_d(3)} AS d3
            FROM blocks
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(d1) AS BIGINT) AS dd1,
                   CAST(sum(d2) AS BIGINT) AS dd2,
                   CAST(sum(d3) AS BIGINT) AS dd3,
                   CAST(sum(d1*d1 + d2*d2 + d3*d3) AS BIGINT) AS sum_d2
            FROM ranked
        )
        SELECT n AS n_blocks, dd1 AS ranksum2_{_F_TYPES[0]},
               dd2 AS ranksum2_{_F_TYPES[1]}, dd3 AS ranksum2_{_F_TYPES[2]},
               CASE WHEN sum_d2 - 48 * n = 0 THEN CAST(0 AS BIGINT)
                    ELSE (10000 * 2 * ((dd1 - 4*n)*(dd1 - 4*n)
                          + (dd2 - 4*n)*(dd2 - 4*n)
                          + (dd3 - 4*n)*(dd3 - 4*n)))
                         // (sum_d2 - 48 * n)
               END AS q_fp4
        FROM s
    """,
    tags=("statistics", "hypothesis-test", "events"),
)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's matched k-sample rank test (k=3): within each user
    block, rank the click / purchase / error counts (average ranks on
    ties), and test whether the three treatments' rank sums differ
    beyond per-user correlation — the rank-valued companion of
    stats_cochran_q on the same blocks, sensitive to HOW MUCH the
    rates differ, not just whether participation flips. The
    tie-corrected statistic (k-1)·Σ(R_j − n(k+1)/2)² / (Σr² −
    nk(k+1)²/4) is asymptotically χ²(2). DOUBLED ranks (2L + E + 2
    from strictly-less / equal counts over the other two values) keep
    average ranks integer; the /4 factors cancel, leaving one guarded
    floor division at fp4. Fully-tied blocks contribute nothing
    (denominator guard covers the all-tied corpus).

    Scale shape: one groupBy(user_id) conditional-count pass, rank
    arithmetic as CASE expressions (no window), a 5-number global
    aggregate, 1-row output.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    blocks = ev.groupBy("user_id").agg(
        *[
            F.count_if(F.col("event_type") == t).cast("long").alias(f"c{i+1}")
            for i, t in enumerate(_F_TYPES)
        ]
    )
    ranked = blocks.select(
        *[F.expr(_sql_d(j)).alias(f"d{j}") for j in (1, 2, 3)]
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d1").cast("long").alias("dd1"),
        F.sum("d2").cast("long").alias("dd2"),
        F.sum("d3").cast("long").alias("dd3"),
        F.sum(
            F.col("d1") * F.col("d1")
            + F.col("d2") * F.col("d2")
            + F.col("d3") * F.col("d3")
        )
        .cast("long")
        .alias("sum_d2"),
    )
    return s.select(
        F.col("n").alias("n_blocks"),
        F.col("dd1").alias(f"ranksum2_{_F_TYPES[0]}"),
        F.col("dd2").alias(f"ranksum2_{_F_TYPES[1]}"),
        F.col("dd3").alias(f"ranksum2_{_F_TYPES[2]}"),
        F.when(F.expr("sum_d2 - 48 * n") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "(10000 * 2 * ((dd1 - 4*n)*(dd1 - 4*n)"
                " + (dd2 - 4*n)*(dd2 - 4*n)"
                " + (dd3 - 4*n)*(dd3 - 4*n)))"
                " div (sum_d2 - 48 * n)"
            ).cast("long")
        )
        .alias("q_fp4"),
    )


# ---------------------------------------------------------------------------
# ml_auc_fold_stability
# ---------------------------------------------------------------------------

_N_FOLDS = 5


@register(
    "ml_auc_fold_stability",
    oracle=f"""
        WITH per_user AS ({_PER_USER_SQL}),
        folded AS (
            SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % {_N_FOLDS} AS fold,
                   score, y
            FROM per_user
        ),
        by_score AS (
            SELECT fold, score, CAST(count(*) AS BIGINT) AS m,
                   CAST(sum(y) AS BIGINT) AS a
            FROM folded GROUP BY fold, score
        ),
        cum AS (
            SELECT fold, score, m, a,
                   COALESCE(SUM(m) OVER (PARTITION BY fold ORDER BY score
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cum_before
            FROM by_score
        ),
        per_fold AS (
            SELECT fold,
                   CAST(sum(m) AS BIGINT) AS n,
                   CAST(sum(a) AS BIGINT) AS n1,
                   CAST(sum(m - a) AS BIGINT) AS n0,
                   CAST(sum(a * (2 * cum_before + m + 1)) AS BIGINT) AS d_pos
            FROM cum GROUP BY fold
        ),
        aucs AS (
            SELECT fold, n, n1, n0,
                   (10000 * (d_pos - n1 * (n1 + 1))) // (2 * n1 * n0) AS auc4
            FROM per_fold WHERE n1 > 0 AND n0 > 0
        ),
        spread AS (
            SELECT CAST(max(auc4) - min(auc4) AS BIGINT) AS range4 FROM aucs
        )
        SELECT fold, n, n1, n0, auc4, spread.range4
        FROM aucs CROSS JOIN spread ORDER BY fold
    """,
    tags=("ml", "evaluation", "auc", "stability"),
)
def ml_auc_fold_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney AUC of the shared click-propensity model per
    md5-assigned fold (_N_FOLDS=5 folds on user_id), with the
    cross-fold range — the "one lucky split?" stability check
    complementing ml_auc_bootstrap_ci (which resamples ONE split).
    AUC per fold is the tie-averaged rank-sum form: doubled average
    ranks from the per-(fold, score) aggregate (2·cum_before + m + 1
    per score group), so 2U = Σd_pos − n1(n1+1) and auc4 is one floor
    division — bit-exact cross-engine. Folds missing a class are
    excluded by the same n1/n0 guard on both sides.

    Scale shape: one groupBy(user_id) fact pass, then all windows run
    over the tiny (fold × distinct-score) relation; 1-row spread
    broadcast back onto ≤5 (_N_FOLDS) rows.
    """
    pu = _per_user(spark, sf_dir)
    folded = pu.select(
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % _N_FOLDS
        ).alias("fold"),
        "score",
        "y",
    )
    by_score = folded.groupBy("fold", "score").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("y").cast("long").alias("a"),
    )
    w = (
        Window.partitionBy("fold")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = by_score.withColumn(
        "cum_before", F.coalesce(F.sum("m").over(w), F.lit(0))
    )
    per_fold = cum.groupBy("fold").agg(
        F.sum("m").cast("long").alias("n"),
        F.sum("a").cast("long").alias("n1"),
        F.sum(F.col("m") - F.col("a")).cast("long").alias("n0"),
        F.sum(F.col("a") * (2 * F.col("cum_before") + F.col("m") + 1))
        .cast("long")
        .alias("d_pos"),
    )
    aucs = per_fold.filter((F.col("n1") > 0) & (F.col("n0") > 0)).select(
        "fold",
        "n",
        "n1",
        "n0",
        F.expr("(10000 * (d_pos - n1 * (n1 + 1))) div (2 * n1 * n0)").alias(
            "auc4"
        ),
    )
    spread = aucs.agg(
        (F.max("auc4") - F.min("auc4")).cast("long").alias("range4")
    )
    return aucs.crossJoin(F.broadcast(spread)).orderBy("fold")


# ---------------------------------------------------------------------------
# sample_ratio_estimator_audit
# ---------------------------------------------------------------------------


@register(
    "sample_ratio_estimator_audit",
    oracle="""
        WITH rev AS (
            SELECT o.o_orderkey,
                   CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 8))
                        AS BIGINT) % 10 = 0 AS in_sample,
                   CAST(FLOOR(o.o_totalprice) AS BIGINT) AS x_u,
                   CAST(COALESCE(SUM(CAST(FLOOR(l.l_extendedprice
                        * (1 - l.l_discount)) AS BIGINT)), 0)
                        AS BIGINT) AS y_u
            FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2, 3
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(count_if(in_sample) AS BIGINT) AS n_sample,
                   CAST(sum(y_u) AS BIGINT) AS y_true,
                   CAST(sum(CASE WHEN in_sample THEN y_u ELSE 0 END)
                        AS BIGINT) AS y_s,
                   CAST(sum(x_u) AS BIGINT) AS x_total,
                   CAST(sum(CASE WHEN in_sample THEN x_u ELSE 0 END)
                        AS BIGINT) AS x_s
            FROM rev
        ),
        est AS (
            SELECT n_orders, n_sample, y_true,
                   (y_s * n_orders) // n_sample AS expansion_est,
                   (((1000000 * y_s) // x_s) * (x_total // 1000)) // 1000
                       AS ratio_est
            FROM s
        )
        SELECT n_orders, n_sample, y_true, expansion_est, ratio_est,
               (10000 * (expansion_est - y_true)) // y_true
                   AS expansion_err4,
               (10000 * (ratio_est - y_true)) // y_true AS ratio_err4
        FROM est
    """,
    tags=("sampling", "estimation", "audit"),
)
def sample_ratio_estimator_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey-estimation audit: estimate total lineitem net revenue
    from a deterministic 10% order sample (md5 head bucket 0 of
    o_orderkey) two ways — the expansion estimator ŷ·N/n (uses only
    the sample) and the ratio estimator ŷ·X/x̂ anchored on the KNOWN
    total of the auxiliary o_totalprice — and report both signed
    relative errors against the exact total. The measured case for
    ratio estimation: order value correlates strongly with lineitem
    revenue, so anchoring on the auxiliary total cancels most of the
    sample's luck — the variance-reduction trick every
    sampled-telemetry revenue dashboard should use, here with the
    exact ground truth this fixture scale can still afford
    (capture-recapture's discipline applied to totals).

    Exactness & overflow: whole currency units per row (per-row
    floors), integer sums; the ratio estimator is evaluated as
    fp6-ratio × (total/1000) / 1000 — two nested floors, identical
    both engines — because the naive y_s·X product overflows BIGINT
    at any interesting scale (the truncation bound is < ~1000·r
    units on a ~1e10-unit total, orders of magnitude below the
    sampling error it audits).

    Scale shape: ONE orders⋈lineitem fact join aggregated to order
    grain, then a single global 6-counter aggregate — 1-row output;
    sample membership is a deterministic hash predicate, no
    materialized sample.
    """
    o = load_table(spark, sf_dir, "orders")
    li = widen(load_table(spark, sf_dir, "lineitem"))
    rev = (
        o.select(
            "o_orderkey",
            (
                F.conv(
                    F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("long")
                % 10
                == 0
            ).alias("in_sample"),
            F.floor(F.col("o_totalprice")).cast("long").alias("x_u"),
        )
        .join(
            li.select(
                "l_orderkey",
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("long")
                .alias("r_u"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .groupBy("o_orderkey", "in_sample", "x_u")
        .agg(F.coalesce(F.sum("r_u"), F.lit(0)).cast("long").alias("y_u"))
    )
    s = rev.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.count_if(F.col("in_sample")).cast("long").alias("n_sample"),
        F.sum("y_u").cast("long").alias("y_true"),
        F.sum(F.when(F.col("in_sample"), F.col("y_u")).otherwise(0))
        .cast("long")
        .alias("y_s"),
        F.sum("x_u").cast("long").alias("x_total"),
        F.sum(F.when(F.col("in_sample"), F.col("x_u")).otherwise(0))
        .cast("long")
        .alias("x_s"),
    )
    est = s.select(
        "n_orders",
        "n_sample",
        "y_true",
        F.expr("(y_s * n_orders) div n_sample").alias("expansion_est"),
        F.expr("(((1000000 * y_s) div x_s) * (x_total div 1000)) div 1000").alias(
            "ratio_est"
        ),
    )
    return est.select(
        "n_orders",
        "n_sample",
        "y_true",
        "expansion_est",
        "ratio_est",
        F.expr("(10000 * (expansion_est - y_true)) div y_true").alias(
            "expansion_err4"
        ),
        F.expr("(10000 * (ratio_est - y_true)) div y_true").alias("ratio_err4"),
    )


# ---------------------------------------------------------------------------
# orders_forecast_mase_backtest
# ---------------------------------------------------------------------------

_SEASON = 12  # months


@register(
    "orders_forecast_mase_backtest",
    oracle=f"""
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   CAST(sum(CAST(FLOOR(o_totalprice * 10000) AS BIGINT))
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1
        ),
        lagged AS (
            SELECT month, rev,
                   LAG(rev, 1) OVER (ORDER BY month) AS prev1,
                   LAG(rev, {_SEASON}) OVER (ORDER BY month) AS prev_s
            FROM monthly
        ),
        eval AS (
            SELECT abs(rev - prev1) AS e_naive,
                   abs(rev - prev_s) AS e_seasonal
            FROM lagged WHERE prev1 IS NOT NULL AND prev_s IS NOT NULL
        )
        SELECT CAST((SELECT count(*) FROM monthly) AS BIGINT) AS n_months,
               CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(e_naive) AS BIGINT) AS sae_naive,
               CAST(sum(e_seasonal) AS BIGINT) AS sae_seasonal,
               (10000 * sum(e_seasonal)) // sum(e_naive) AS mase4
        FROM eval
    """,
    tags=("orders", "forecasting", "evaluation", "time-series"),
)
def orders_forecast_mase_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE backtest of the seasonal-naive monthly revenue forecast:
    over every month where both benchmarks are defined, the ratio of
    the seasonal-naive (lag-12, _SEASON months) absolute error sum to the
    naive (lag-1) one — the scale-free accuracy number (Hyndman's
    MASE, denominator folded over the same eval months so the ratio
    is a single floor division) that says whether last-year-same-
    month beats last-month on this series. mase4 < 10000 means
    seasonality carries real signal; the Croston / seasonal-strength
    entries describe the series, this one scores the forecast.

    Scale shape: one month-grain aggregation of orders (map-side
    combined; the fact shuffle), LAG windows over the ≤ ~100-row
    month series, a 1-row report.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 10000).cast("long"))
        .cast("long")
        .alias("rev")
    )
    w = Window.orderBy("month")
    lagged = monthly.select(
        "rev",
        F.lag("rev", 1).over(w).alias("prev1"),
        F.lag("rev", _SEASON).over(w).alias("prev_s"),
    )
    ev = lagged.filter(
        F.col("prev1").isNotNull() & F.col("prev_s").isNotNull()
    ).select(
        F.abs(F.col("rev") - F.col("prev1")).alias("e_naive"),
        F.abs(F.col("rev") - F.col("prev_s")).alias("e_seasonal"),
    )
    n_months = monthly.agg(F.count(F.lit(1)).cast("long").alias("n_months"))
    return (
        ev.agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum("e_naive").cast("long").alias("sae_naive"),
            F.sum("e_seasonal").cast("long").alias("sae_seasonal"),
        )
        .crossJoin(F.broadcast(n_months))
        .select(
            "n_months",
            "n_eval",
            "sae_naive",
            "sae_seasonal",
            F.expr("(10000 * sae_seasonal) div sae_naive").alias("mase4"),
        )
    )
