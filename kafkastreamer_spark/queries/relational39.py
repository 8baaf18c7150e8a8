"""Round-12 batch 248: cost-sensitive threshold selection, sampling
replicate-variance auditing, retention-horizon purge accounting, and
A/B experiment health + effect readout.

* ``ml_threshold_cost_curve`` — cost-sensitive operating-point
  selection for the shared click-propensity model: for each FP:FN
  cost ratio in a fixed ladder, the score threshold minimizing
  expected cost, with the no-model baseline for comparison.
* ``sample_replicate_variance_audit`` — empirical variance of ten
  disjoint-hash-replicate expansion estimates of total order revenue
  vs the theoretical SRS variance — the "is my sampling error what
  the formula says" audit completing the estimator-audit family
  (capture-recapture, ratio estimator).
* ``governance_retention_horizon_audit`` — rows and share each table
  would purge under a 30/90/365-day retention policy anchored at the
  table's own max date — the storage-planning sibling of the
  subject-keyed gdpr_erasure_audit.
* ``ml_ab_srm_and_uplift`` — deterministic 50/50 user split: sample
  -ratio-mismatch chi-square (assignment health), per-arm conversion
  rates, uplift, and the 2x2 independence chi-square (effect) — the
  experimentation guardrail readout.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B
ML-evaluation / governance / experimentation closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.queries.relational16 import _PER_USER_SQL, _per_user
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# ml_threshold_cost_curve
# ---------------------------------------------------------------------------

# (label, c_fp, c_fn) — false-negative-averse, symmetric, and
# false-positive-averse regimes
_COST_RATIOS = (("fp1_fn1", 1, 1), ("fp1_fn5", 1, 5), ("fp5_fn1", 5, 1))


@register(
    "ml_threshold_cost_curve",
    oracle=f"""
        WITH per_user AS ({_PER_USER_SQL}),
        by_score AS (
            SELECT score, CAST(count(*) AS BIGINT) AS m,
                   CAST(sum(y) AS BIGINT) AS a
            FROM per_user GROUP BY score
        ),
        tot AS (
            SELECT CAST(sum(m) AS BIGINT) AS n, CAST(sum(a) AS BIGINT) AS pos
            FROM by_score
        ),
        cuts AS (
            -- predict positive iff score >= t, for every distinct
            -- score t: FP = negatives at/above t, FN = positives
            -- below t
            SELECT s.score AS t,
                   CAST(sum(CASE WHEN b.score >= s.score
                        THEN b.m - b.a ELSE 0 END) AS BIGINT) AS fp,
                   CAST(sum(CASE WHEN b.score < s.score
                        THEN b.a ELSE 0 END) AS BIGINT) AS fn
            FROM by_score s CROSS JOIN by_score b
            GROUP BY 1
        ),
        ratios AS (
            SELECT * FROM (VALUES {", ".join(f"('{lbl}', {cfp}, {cfn})" for lbl, cfp, cfn in _COST_RATIOS)})
                AS r(ratio, c_fp, c_fn)
        ),
        costs AS (
            SELECT r.ratio, r.c_fp, r.c_fn, c.t,
                   r.c_fp * c.fp + r.c_fn * c.fn AS cost,
                   c.fp, c.fn
            FROM ratios r CROSS JOIN cuts c
        ),
        best AS (
            SELECT ratio, c_fp, c_fn, t, cost, fp, fn,
                   ROW_NUMBER() OVER (PARTITION BY ratio
                        ORDER BY cost, t) AS rk
            FROM costs
        )
        SELECT b.ratio, CAST(b.t AS BIGINT) AS best_t, b.fp, b.fn,
               CAST(b.cost AS BIGINT) AS best_cost,
               CAST(b.c_fn * tot.pos AS BIGINT) AS all_negative_cost,
               (10000 * b.cost) // (b.c_fn * tot.pos) AS cost_vs_baseline4
        FROM best b CROSS JOIN tot WHERE b.rk = 1
        ORDER BY b.ratio
    """,
    tags=("ml", "evaluation", "threshold", "cost"),
)
def ml_threshold_cost_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive operating point for the shared click-propensity
    model: for each FP:FN cost regime (1:1, 1:5, 5:1),
    sweep every distinct-score threshold (predict positive iff
    score ≥ t), pick the cost-minimizing one (cost then t
    tie-break — deterministic), and report it against the
    all-negative baseline (cost = c_fn · positives). The decision
    layer the PR ladder (ml_pr_threshold_ladder) leaves to the
    reader: WHICH point on the curve to run, given asymmetric error
    costs.

    Scale shape: one groupBy(user_id) fact pass, then the sweep is a
    self-cross of the ≤|distinct scores| aggregate (bounded), an
    argmin window over the same, 3-row output.
    """
    pu = _per_user(spark, sf_dir)
    by_score = pu.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("y").cast("long").alias("a"),
    )
    tot = by_score.agg(
        F.sum("m").cast("long").alias("n"), F.sum("a").cast("long").alias("pos")
    )
    s = by_score.select(F.col("score").alias("t"))
    b = by_score.select(
        F.col("score").alias("bs"), "m", "a"
    )
    cuts = (
        s.crossJoin(b)
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("bs") >= F.col("t"), F.col("m") - F.col("a")).otherwise(0))
            .cast("long")
            .alias("fp"),
            F.sum(F.when(F.col("bs") < F.col("t"), F.col("a")).otherwise(0))
            .cast("long")
            .alias("fn"),
        )
    )
    ratios = spark.createDataFrame(
        list(_COST_RATIOS), "ratio string, c_fp long, c_fn long"
    )
    costs = F.broadcast(ratios).crossJoin(cuts).select(
        "ratio",
        "c_fp",
        "c_fn",
        "t",
        "fp",
        "fn",
        (F.col("c_fp") * F.col("fp") + F.col("c_fn") * F.col("fn")).alias("cost"),
    )
    best = costs.withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("ratio").orderBy("cost", "t")),
    ).filter(F.col("rk") == 1)
    return (
        best.crossJoin(F.broadcast(tot))
        .select(
            "ratio",
            F.col("t").cast("long").alias("best_t"),
            "fp",
            "fn",
            F.col("cost").cast("long").alias("best_cost"),
            (F.col("c_fn") * F.col("pos")).cast("long").alias("all_negative_cost"),
            F.expr("(10000 * cost) div (c_fn * pos)").alias("cost_vs_baseline4"),
        )
        .orderBy("ratio")
    )


# ---------------------------------------------------------------------------
# sample_replicate_variance_audit
# ---------------------------------------------------------------------------

_N_REPS = 10


@register(
    "sample_replicate_variance_audit",
    oracle=f"""
        WITH vals AS (
            SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                        AS BIGINT) % {_N_REPS} AS rep,
                   CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS y_k
            FROM orders
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y_k) AS BIGINT) AS y_true_k,
                   CAST(sum(y_k * y_k) AS BIGINT) AS yy
            FROM vals
        ),
        reps AS (
            SELECT rep, CAST(count(*) AS BIGINT) AS n_b,
                   CAST(sum(y_k) AS BIGINT) AS y_b
            FROM vals GROUP BY rep
        ),
        ests AS (
            SELECT rep, (y_b * tot.n) // n_b AS est_k
            FROM reps CROSS JOIN tot
        ),
        emp AS (
            SELECT CAST(count(*) AS BIGINT) AS r,
                   CAST(sum(est_k) AS BIGINT) AS se,
                   CAST(sum(est_k * est_k) AS BIGINT) AS see
            FROM ests
        )
        SELECT tot.n AS n_orders, emp.r AS n_replicates,
               tot.y_true_k,
               (emp.r * emp.see - emp.se * emp.se)
                   // (emp.r * (emp.r - 1)) AS var_emp_k2,
               -- theoretical SRS variance of the expansion total at
               -- n/{_N_REPS} draws: N^2 (1-f) S^2 / (n/{_N_REPS}),
               -- f = 1/{_N_REPS}; evaluated with nested floors
               ((tot.n * {_N_REPS} * ({_N_REPS} - 1))
                   * ((tot.n * tot.yy - tot.y_true_k * tot.y_true_k)
                      // (tot.n * (tot.n - 1))))
                   // {_N_REPS} AS var_theory_k2,
               (10000 * ((emp.r * emp.see - emp.se * emp.se)
                         // (emp.r * (emp.r - 1))))
                   // (((tot.n * {_N_REPS} * ({_N_REPS} - 1))
                       * ((tot.n * tot.yy - tot.y_true_k * tot.y_true_k)
                          // (tot.n * (tot.n - 1))))
                      // {_N_REPS}) AS var_ratio4
        FROM tot CROSS JOIN emp
    """,
    tags=("sampling", "estimation", "variance", "audit"),
)
def sample_replicate_variance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the sampling error match the formula? Ten disjoint md5
    replicates of orders each produce an expansion estimate of total
    order value; their empirical variance is compared with the
    theoretical SRS variance N²(1−f)S²/n at the same draw size
    (f = 1/10), as a fp4 ratio. A healthy pipeline reads
    var_ratio4 ≈ 10⁴ within replicate noise; a broken hash (skewed
    buckets) or heavy-tail-broken formula shows up as a big
    departure — the replication-based uncertainty check that
    dashboards built on sampled telemetry should run but rarely do.
    Completes the estimator-audit family: capture-recapture audits a
    POINT estimate, the ratio audit a design choice, this one the
    VARIANCE claim.

    Exactness & overflow: order values in whole thousands (per-row
    floor) keep every square and cross-product far inside BIGINT at
    any fixture scale; variances are the integer (rΣe² − (Σe)²)/r(r−1)
    form with nested floors identical on both engines (hash-multinomial
    replicate sizes vs exact-n SRS is a documented approximation —
    the ratio's expected value is still ~1).

    Scale shape: one scan of orders, one 10-row replicate aggregate,
    1-row output; no joins over unaggregated rows.
    """
    o = load_table(spark, sf_dir, "orders")
    vals = o.select(
        (
            F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % _N_REPS
        ).alias("rep"),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("y_k"),
    )
    tot = vals.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y_k").cast("long").alias("y_true_k"),
        F.sum(F.col("y_k") * F.col("y_k")).cast("long").alias("yy"),
    )
    reps = vals.groupBy("rep").agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("y_k").cast("long").alias("y_b"),
    )
    ests = reps.crossJoin(F.broadcast(tot)).select(
        F.expr("(y_b * n) div n_b").alias("est_k")
    )
    emp = ests.agg(
        F.count(F.lit(1)).cast("long").alias("r"),
        F.sum("est_k").cast("long").alias("se"),
        F.sum(F.col("est_k") * F.col("est_k")).cast("long").alias("see"),
    )
    R = _N_REPS
    var_emp = "(r * see - se * se) div (r * (r - 1))"
    s2 = "((n * yy - y_true_k * y_true_k) div (n * (n - 1)))"
    var_theory = f"((n * {R} * ({R} - 1)) * {s2}) div {R}"
    return tot.crossJoin(F.broadcast(emp)).select(
        F.col("n").alias("n_orders"),
        F.col("r").alias("n_replicates"),
        "y_true_k",
        F.expr(var_emp).alias("var_emp_k2"),
        F.expr(var_theory).alias("var_theory_k2"),
        F.expr(f"(10000 * ({var_emp})) div ({var_theory})").alias("var_ratio4"),
    )


# ---------------------------------------------------------------------------
# governance_retention_horizon_audit
# ---------------------------------------------------------------------------

_HORIZONS_D = (30, 90, 365)


@register(
    "governance_retention_horizon_audit",
    oracle=f"""
        WITH h AS (SELECT unnest([{", ".join(str(h) for h in _HORIZONS_D)}])
                       AS horizon_d),
        ev AS (
            SELECT 'events' AS tbl, h.horizon_d,
                   CAST(count_if(e.ts < (SELECT max(ts) FROM events)
                        - to_days(CAST(h.horizon_d AS INT))) AS BIGINT) AS n_purge,
                   CAST(count(*) AS BIGINT) AS n_total
            FROM events e CROSS JOIN h GROUP BY 1, 2
        ),
        o AS (
            SELECT 'orders' AS tbl, h.horizon_d,
                   CAST(count_if(oo.o_orderdate
                        < (SELECT max(o_orderdate) FROM orders)
                          - to_days(CAST(h.horizon_d AS INT))) AS BIGINT) AS n_purge,
                   CAST(count(*) AS BIGINT) AS n_total
            FROM orders oo CROSS JOIN h GROUP BY 1, 2
        ),
        li AS (
            SELECT 'lineitem' AS tbl, h.horizon_d,
                   CAST(count_if(l.l_shipdate
                        < (SELECT max(l_shipdate) FROM lineitem)
                          - to_days(CAST(h.horizon_d AS INT))) AS BIGINT) AS n_purge,
                   CAST(count(*) AS BIGINT) AS n_total
            FROM lineitem l CROSS JOIN h GROUP BY 1, 2
        )
        SELECT tbl, CAST(horizon_d AS BIGINT) AS horizon_d, n_purge, n_total,
               (10000 * n_purge) // n_total AS purge_share4
        FROM (SELECT * FROM ev UNION ALL SELECT * FROM o
              UNION ALL SELECT * FROM li)
        ORDER BY tbl, horizon_d
    """,
    tags=("governance", "retention", "ops"),
)
def governance_retention_horizon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy impact accounting: for each horizon in
    (30, 90, 365) days, the rows (and share) each time-carrying table
    would purge if records older than max(date) − horizon were
    deleted — anchored at each table's own watermark so the audit is
    reproducible on a static fixture. The storage-planning sibling of
    gdpr_erasure_audit (subject-keyed deletes) and the aging buckets
    (receivables view): this one prices the retention knob itself.

    Scale shape: per table, one max-date aggregate broadcast into a
    conditional count per horizon (the horizons explode a 3-row
    literal, multiplying counters, not rows) — three scans, 9-row
    output.
    """
    h = spark.createDataFrame([(d,) for d in _HORIZONS_D], "horizon_d long")

    def audit(df: DataFrame, tbl: str, col: str) -> DataFrame:
        mx = df.agg(F.max(col).alias("mx"))
        return (
            df.crossJoin(F.broadcast(mx))
            .crossJoin(F.broadcast(h))
            .groupBy("horizon_d")
            .agg(
                F.sum(
                    F.when(
                        F.expr(f"{col} < mx - make_interval(0, 0, 0, horizon_d)"),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_purge"),
                F.count(F.lit(1)).cast("long").alias("n_total"),
            )
            .select(
                F.lit(tbl).alias("tbl"),
                F.col("horizon_d").cast("long"),
                "n_purge",
                "n_total",
                F.expr("(10000 * n_purge) div n_total").alias("purge_share4"),
            )
        )

    ev = widen(load_table(spark, sf_dir, "events"))
    o = load_table(spark, sf_dir, "orders")
    li = widen(load_table(spark, sf_dir, "lineitem"))
    out = (
        audit(ev, "events", "ts")
        .unionByName(audit(o, "orders", "o_orderdate"))
        .unionByName(audit(li, "lineitem", "l_shipdate"))
    )
    return out.orderBy("tbl", "horizon_d")


# ---------------------------------------------------------------------------
# ml_ab_srm_and_uplift
# ---------------------------------------------------------------------------


@register(
    "ml_ab_srm_and_uplift",
    oracle=f"""
        WITH per_user AS ({_PER_USER_SQL}),
        armed AS (
            SELECT CAST(('0x' || substr(md5('ab_' || CAST(user_id AS VARCHAR)),
                        1, 8)) AS BIGINT) % 2 AS arm, y
            FROM per_user
        ),
        s AS (
            SELECT CAST(count_if(arm = 0) AS BIGINT) AS na,
                   CAST(count_if(arm = 1) AS BIGINT) AS nb,
                   CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS ca,
                   CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS cb
            FROM armed
        )
        SELECT na, nb, ca, cb,
               ((na - nb) * (na - nb) * 10000) // (na + nb) AS srm_chi2_fp4,
               (10000 * ca) // na AS rate_a4,
               (10000 * cb) // nb AS rate_b4,
               (10000 * ca) // na - (10000 * cb) // nb AS uplift4,
               -- 2x2 independence chi-square via nested floors
               -- (na+nb)(ad-bc)^2 / (row1 row2 col1 col2)
               ((((((ca * (nb - cb) - cb * (na - ca))
                    * (ca * (nb - cb) - cb * (na - ca))) // na)
                  * (na + nb)) // nb) * 10000)
                 // ((ca + cb) * ((na - ca) + (nb - cb))) AS indep_chi2_fp4
        FROM s
    """,
    tags=("ml", "experimentation", "ab-test", "statistics"),
)
def ml_ab_srm_and_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout on a deterministic 50/50 user split
    (salted md5 parity): sample-ratio-mismatch chi-square first — the
    assignment-health guardrail that invalidates an experiment before
    any effect is read (expected ≈ 0 for a healthy hash; χ² =
    (na−nb)²/(na+nb) for equal allocation) — then per-arm conversion
    rates (the shared purchase>error label), their uplift, and the
    2×2 independence chi-square for the effect itself (expected ≈ 0
    here: the split is independent of behavior by construction, so
    this entry doubles as a null-calibration fixture for the
    statistic).

    Exactness & overflow: the 2×2 chi-square numerator n(ad−bc)²
    overflows BIGINT at fixture scale, so it is evaluated with
    nested floor divisions interleaving the denominator factors
    (identical both engines, documented order).

    Scale shape: one groupBy(user_id) fact pass, a 4-counter global
    aggregate, 1-row output.
    """
    pu = _per_user(spark, sf_dir)
    armed = pu.select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ab_"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm"),
        "y",
    )
    s = armed.agg(
        F.count_if(F.col("arm") == 0).cast("long").alias("na"),
        F.count_if(F.col("arm") == 1).cast("long").alias("nb"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    return s.select(
        "na",
        "nb",
        "ca",
        "cb",
        F.expr("((na - nb) * (na - nb) * 10000) div (na + nb)").alias(
            "srm_chi2_fp4"
        ),
        F.expr("(10000 * ca) div na").alias("rate_a4"),
        F.expr("(10000 * cb) div nb").alias("rate_b4"),
        F.expr("(10000 * ca) div na - (10000 * cb) div nb").alias("uplift4"),
        F.expr(
            "((((((ca * (nb - cb) - cb * (na - ca))"
            " * (ca * (nb - cb) - cb * (na - ca))) div na)"
            " * (na + nb)) div nb) * 10000)"
            " div ((ca + cb) * ((na - ca) + (nb - cb)))"
        ).alias("indep_chi2_fp4"),
    )
