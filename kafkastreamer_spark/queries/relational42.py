"""Round-13 batch 251: inter-rater agreement, rank correlation over
time, a distribution-free location test, and corpus stylometry.

* ``ml_cohens_kappa`` — chance-corrected agreement between the
  threshold classifier (click score >= 3) and the observed outcome on
  the shared per-user propensity model: the agreement statistic the
  raw-accuracy entries (gains table, cost curve) don't correct for.
* ``stats_kendall_tau`` — Kendall tau-b between month index and
  monthly order revenue: the concordance view of monotone trend next
  to agg_ols_trend (linear fit) and orders_theil_sen_trend (median
  slope); exact integer concordant/discordant counts on cents.
* ``stats_mood_median_test`` — Mood's median test of per-user
  activity across adopter halves (first event before/after the
  corpus midpoint): counts above/at-or-below the grand median per
  group + chi-square, the robust k-sample location companion of
  orders_mann_whitney_u (rank-sum, 2-sample) and stats_sign_test
  (paired).
* ``text_burrows_delta`` — Burrows' Delta stylometric distance
  between every source pair over the top-20 corpus tokens: per-token
  z-scores of relative frequency across sources, mean absolute
  z-difference per pair — the authorship/style-drift audit between
  corpus sources (text_source_tv_distance measures distribution
  mass; Delta measures standardized per-token deviation).

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B statistics /
ML-evaluation / LLM-text-analysis closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import SQL_TOKENS, tokens
from kafkastreamer_spark.queries._util import SCALE, fixed
from kafkastreamer_spark.queries.relational16 import _PER_USER_SQL, _per_user
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# ml_cohens_kappa
# ---------------------------------------------------------------------------

_KAPPA_THRESHOLD = 3  # predicted positive when click score >= 3


@register(
    "ml_cohens_kappa",
    oracle=f"""
        WITH per_user AS ({_PER_USER_SQL}),
        rated AS (
            SELECT CASE WHEN score >= {_KAPPA_THRESHOLD} THEN 1 ELSE 0 END AS a,
                   y AS b
            FROM per_user
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(count_if(a = b) AS BIGINT) AS n_agree,
                   CAST(sum(a) AS BIGINT) AS a1,
                   CAST(sum(b) AS BIGINT) AS b1
            FROM rated
        )
        SELECT n, n_agree, a1, b1,
               CAST(floor(10000.0 * (n * n_agree - (a1 * b1 + (n - a1) * (n - b1)))
                    / (n * n - (a1 * b1 + (n - a1) * (n - b1)))) AS BIGINT)
                   AS kappa4
        FROM s
        WHERE n * n > a1 * b1 + (n - a1) * (n - b1)
    """,
    tags=("ml", "evaluation", "agreement"),
)
def ml_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the fixed-threshold click classifier
    (score >= 3 ⇒ predicted converter) and the observed outcome y on
    the shared per-user propensity model: po = agreement rate, pe =
    marginal chance agreement, kappa = (po − pe)/(1 − pe). Kappa is
    a single floor over one exact-integer rational — with n·agree and
    the marginal products all BIGINT (n < 2^26 at any fixture scale,
    so n² < 2^52 is exact in every intermediate) the IEEE division is
    bit-identical cross-engine; the denominator guard drops the
    degenerate all-one-class table on both sides.

    Scale shape: one groupBy(user_id) fact pass, then a single
    4-number global aggregate — nothing after the first shuffle
    exceeds one row.
    """
    pu = _per_user(spark, sf_dir)
    rated = pu.select(
        F.when(F.col("score") >= _KAPPA_THRESHOLD, 1).otherwise(0).alias("a"),
        F.col("y").alias("b"),
    )
    s = rated.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(F.col("a") == F.col("b")).cast("long").alias("n_agree"),
        F.sum("a").cast("long").alias("a1"),
        F.sum("b").cast("long").alias("b1"),
    )
    chance = F.col("a1") * F.col("b1") + (F.col("n") - F.col("a1")) * (
        F.col("n") - F.col("b1")
    )
    return s.filter(F.col("n") * F.col("n") > chance).select(
        "n",
        "n_agree",
        "a1",
        "b1",
        F.floor(
            10000.0
            * (F.col("n") * F.col("n_agree") - chance)
            / (F.col("n") * F.col("n") - chance)
        )
        .cast("long")
        .alias("kappa4"),
    )


# ---------------------------------------------------------------------------
# stats_kendall_tau
# ---------------------------------------------------------------------------


@register(
    "stats_kendall_tau",
    oracle="""
        WITH monthly AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS m,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS rev_c
            FROM orders GROUP BY 1
        ),
        pairs AS (
            SELECT CAST(count_if(b.rev_c > a.rev_c) AS BIGINT) AS n_conc,
                   CAST(count_if(b.rev_c < a.rev_c) AS BIGINT) AS n_disc
            FROM monthly a JOIN monthly b ON a.m < b.m
        ),
        ties AS (
            SELECT CAST(COALESCE(sum(t * (t - 1) // 2), 0) AS BIGINT) AS n2
            FROM (SELECT count(*) AS t FROM monthly GROUP BY rev_c)
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM monthly)
        SELECT n_months, n_conc, n_disc, n2 AS n_ties_y,
               CAST(floor(10000.0 * (n_conc - n_disc)
                    / sqrt(CAST((n_months * (n_months - 1) // 2)
                                * (n_months * (n_months - 1) // 2 - n2)
                           AS DOUBLE))) AS BIGINT) AS tau4
        FROM pairs CROSS JOIN ties CROSS JOIN n
        WHERE n_months * (n_months - 1) // 2 > n2
    """,
    tags=("statistics", "correlation", "timeseries"),
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between calendar month and monthly order revenue:
    the concordance-based monotone-trend statistic (is revenue mostly
    rising?) complementing the parametric OLS slope and the Theil–Sen
    median slope. Month keys are distinct by construction (no x-ties,
    n1 = 0), so tau-b = (C − D)/sqrt(n0 · (n0 − n2)) with n2 the
    revenue-tie correction; C/D/n2 are exact BIGINT counts over
    integer cents and the final value is one floor over a double
    division of exact integers — bit-identical cross-engine.

    Scale shape: the fact table aggregates to the calendar-bounded
    monthly relation (≤ a few hundred rows at ANY corpus size) before
    the pairwise pass, so the inequality self-join is over a bounded
    domain — a broadcast nested-loop over months, never over facts.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("m")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_c")
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    pairs = a.join(b, F.col("a.m") < F.col("b.m")).agg(
        F.count_if(F.col("b.rev_c") > F.col("a.rev_c")).cast("long").alias("n_conc"),
        F.count_if(F.col("b.rev_c") < F.col("a.rev_c")).cast("long").alias("n_disc"),
    )
    ties = (
        monthly.groupBy("rev_c")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.expr("t * (t - 1) div 2")), F.lit(0)
            )
            .cast("long")
            .alias("n2")
        )
    )
    n = monthly.agg(F.count(F.lit(1)).cast("long").alias("n_months"))
    n0 = F.expr("n_months * (n_months - 1) div 2")
    return (
        pairs.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(n))
        .filter(n0 > F.col("n2"))
        .select(
            "n_months",
            "n_conc",
            "n_disc",
            F.col("n2").alias("n_ties_y"),
            F.floor(
                10000.0
                * (F.col("n_conc") - F.col("n_disc"))
                / F.sqrt((n0 * (n0 - F.col("n2"))).cast("double"))
            )
            .cast("long")
            .alias("tau4"),
        )
    )


# ---------------------------------------------------------------------------
# stats_mood_median_test
# ---------------------------------------------------------------------------


@register(
    "stats_mood_median_test",
    oracle=f"""
        WITH anchor AS (
            SELECT epoch_us(min(ts)) + epoch_us(max(ts)) AS mid2 FROM events
        ),
        per_user AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CASE WHEN 2 * epoch_us(min(e.ts)) < anchor.mid2
                        THEN 'early' ELSE 'late' END AS grp
            FROM events e CROSS JOIN anchor
            GROUP BY user_id, anchor.mid2
        ),
        byc AS (SELECT cnt, count(*) AS f FROM per_user GROUP BY cnt),
        med AS (
            SELECT min(cnt) AS median_cnt
            FROM (
                SELECT cnt,
                       sum(f) OVER (ORDER BY cnt
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                       (SELECT sum(f) FROM byc) AS nu
                FROM byc
            )
            WHERE 2 * cum >= nu + 1
        ),
        cells AS (
            SELECT grp, CASE WHEN cnt > med.median_cnt THEN 1 ELSE 0 END AS hi,
                   CAST(count(*) AS BIGINT) AS obs
            FROM per_user CROSS JOIN med GROUP BY 1, 2
        ),
        rt AS (SELECT grp, sum(obs) AS rt FROM cells GROUP BY grp),
        ct AS (SELECT hi, sum(obs) AS ct FROM cells GROUP BY hi),
        tot AS (SELECT sum(obs) AS n FROM cells),
        terms AS (
            SELECT CAST(floor(
                       (obs - CAST(rt AS DOUBLE) * ct / n)
                     * (obs - CAST(rt AS DOUBLE) * ct / n)
                     / (CAST(rt AS DOUBLE) * ct / n) * {SCALE}
                   ) AS BIGINT) AS t4
            FROM cells JOIN rt USING (grp) JOIN ct USING (hi) CROSS JOIN tot
        )
        SELECT (SELECT CAST(sum(obs) AS BIGINT) FROM cells) AS n_users,
               (SELECT CAST(median_cnt AS BIGINT) FROM med) AS median_cnt,
               (SELECT CAST(COALESCE(sum(CASE WHEN grp = 'early' AND hi = 1
                                              THEN obs END), 0) AS BIGINT)
                  FROM cells) AS early_gt,
               (SELECT CAST(COALESCE(sum(CASE WHEN grp = 'late' AND hi = 1
                                              THEN obs END), 0) AS BIGINT)
                  FROM cells) AS late_gt,
               CAST(sum(t4) AS DOUBLE) / {SCALE} AS chi2
        FROM terms
    """,
    tags=("statistics", "events", "robust"),
)
def stats_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: do early adopters (first event before the
    corpus midpoint — the exact 2·epoch_us anchor stats_sign_test
    uses) stay more active than late ones? Per-user event counts are
    split at the grand median (discrete percentile semantics: the
    smallest count whose cumulative frequency reaches ceil(n/2)) into
    a 2×2 (adopter half × above-median) table, tested with the
    chi-square on marginal-expected counts. The distribution-free
    location test that needs no rank sum — robust to the heavy upper
    tail activity counts always carry.

    Scale shape: one groupBy(user_id) fact pass; the grand median
    comes from cumulative counts over the BOUNDED per-user-count
    domain (a few hundred distinct values regardless of corpus size —
    no per-row global rank window); everything downstream of the
    count-domain rollup is ≤4 rows. Per-cell chi-square terms floor
    to fixed-point BIGINT before summing, so the total is
    partial-aggregation-order independent (the orders_chisq idiom).
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    anchor = ev.agg(
        (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))).alias("mid2")
    )
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "mid2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min(F.unix_micros("ts")).alias("first_us"),
        )
        .select(
            "cnt",
            F.when(2 * F.col("first_us") < F.col("mid2"), "early")
            .otherwise("late")
            .alias("grp"),
        )
    )
    per_user = per_user.persist()  # median pass + cell pass share it
    byc = per_user.groupBy("cnt").agg(F.count(F.lit(1)).alias("f"))
    wc = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
    nu = byc.agg(F.sum("f").alias("nu"))
    med = (
        byc.select("cnt", F.sum("f").over(wc).alias("cum"))
        .crossJoin(F.broadcast(nu))
        .filter(2 * F.col("cum") >= F.col("nu") + 1)
        .agg(F.min("cnt").alias("median_cnt"))
    )
    cells = (
        per_user.crossJoin(F.broadcast(med))
        .groupBy(
            "grp",
            F.when(F.col("cnt") > F.col("median_cnt"), 1).otherwise(0).alias("hi"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("obs"))
    )
    cells = cells.persist()
    rt = cells.groupBy("grp").agg(F.sum("obs").alias("rt"))
    ct = cells.groupBy("hi").agg(F.sum("obs").alias("ct"))
    tot = cells.agg(F.sum("obs").alias("n"))
    exp = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    term = (F.col("obs") - exp) * (F.col("obs") - exp) / exp
    chi2 = (
        cells.join(F.broadcast(rt), "grp")
        .join(F.broadcast(ct), "hi")
        .crossJoin(F.broadcast(tot))
        .select(fixed(term).alias("t4"))
        .agg((F.sum("t4").cast("double") / SCALE).alias("chi2"))
    )
    summary = cells.agg(
        F.sum("obs").cast("long").alias("n_users"),
        F.coalesce(
            F.sum(F.when((F.col("grp") == "early") & (F.col("hi") == 1), F.col("obs"))),
            F.lit(0),
        )
        .cast("long")
        .alias("early_gt"),
        F.coalesce(
            F.sum(F.when((F.col("grp") == "late") & (F.col("hi") == 1), F.col("obs"))),
            F.lit(0),
        )
        .cast("long")
        .alias("late_gt"),
    )
    return (
        summary.crossJoin(F.broadcast(med.select(F.col("median_cnt").cast("long"))))
        .crossJoin(F.broadcast(chi2))
        .select("n_users", "median_cnt", "early_gt", "late_gt", "chi2")
    )


# ---------------------------------------------------------------------------
# text_burrows_delta
# ---------------------------------------------------------------------------

_DELTA_TOP = 20  # most-frequent corpus tokens forming the style vector
_DELTA_FP = 1000000  # fp6 per-source relative token frequency


@register(
    "text_burrows_delta",
    oracle=f"""
        WITH tok AS (
            SELECT source, unnest({SQL_TOKENS}) AS t FROM documents
        ),
        top_tok AS (
            SELECT t FROM tok GROUP BY t
            ORDER BY count(*) DESC, t LIMIT {_DELTA_TOP}
        ),
        per_src AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_tok
            FROM tok GROUP BY source
        ),
        cnt AS (
            SELECT source, t, CAST(count(*) AS BIGINT) AS c
            FROM tok JOIN top_tok USING (t) GROUP BY 1, 2
        ),
        grid AS (
            SELECT p.source, tt.t,
                   CAST(floor((1000000.0 * COALESCE(c.c, 0)) / p.n_tok)
                        AS BIGINT) AS g
            FROM per_src p CROSS JOIN top_tok tt
            LEFT JOIN cnt c ON c.source = p.source AND c.t = tt.t
        ),
        tstat AS (
            SELECT t, CAST(count(*) AS BIGINT) AS s,
                   CAST(sum(g) AS BIGINT) AS sumg,
                   CAST(sum(g * g) AS BIGINT) AS sumg2
            FROM grid GROUP BY t
        ),
        live AS (
            SELECT t, s, s * sumg2 - sumg * sumg AS d
            FROM tstat WHERE s * sumg2 - sumg * sumg > 0
        ),
        terms AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(floor(10000.0 * live.s * abs(a.g - b.g)
                        / sqrt(CAST(live.d AS DOUBLE))) AS BIGINT) AS term4
            FROM grid a
            JOIN grid b ON a.t = b.t AND a.source < b.source
            JOIN live ON live.t = a.t
        )
        SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(term4) AS BIGINT) // count(*) AS delta4
        FROM terms GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("llm-data", "text", "stylometry"),
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every pair of corpus sources: over the
    top-20 corpus tokens (count DESC, token tie-break — a total
    order), each source's relative token frequency is standardized
    across sources (population z-score) and Delta(a,b) is the mean
    |z_a − z_b|. The classic stylometric distance — style drift
    between sources that total-variation distance (mass) and vocab
    Jaccard (sets) both miss.

    Exactness: frequencies quantize to fp6 BIGINTs (one exact floor
    per cell), so per-token sums/squares are exact integers and
    z_a − z_b = s·(g_a − g_b)/sqrt(s·Σg² − (Σg)²) is one IEEE
    division of exact integers; each pair term floors to fp4 BIGINT
    BEFORE the pair sum (order-independent), and Delta is one integer
    division. Zero-variance tokens are excluded by the d > 0 guard on
    both sides. No overflow: g ≤ 10⁶, so (Σg)² ≤ (S·10⁶)² — safe for
    any plausible source count.

    Scale shape: one token explode feeds both the top-k (shuffle at
    vocabulary size with map-side combine) and the per-(source,
    token) counts against the broadcast top-20; everything downstream
    lives on the (sources × 20) grid — pairwise work is bounded by
    the SOURCE count squared, never by corpus size.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    tok = d.select("source", F.explode(tokens("text")).alias("t"))
    tok = tok.persist()  # top-k, per-source totals, and counts share it
    top_tok = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "t")
        .limit(_DELTA_TOP)
        .select("t")
    )
    per_src = tok.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_tok"))
    cnt = (
        tok.join(F.broadcast(top_tok), "t")
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    grid = (
        per_src.crossJoin(F.broadcast(top_tok))
        .join(cnt, ["source", "t"], "left")
        .select(
            "source",
            "t",
            F.floor(
                (F.lit(float(_DELTA_FP)) * F.coalesce(F.col("c"), F.lit(0)))
                / F.col("n_tok")
            )
            .cast("long")
            .alias("g"),
        )
    )
    grid = grid.persist()  # token stats + both pair sides share it
    tstat = grid.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("s"),
        F.sum("g").cast("long").alias("sumg"),
        F.sum(F.col("g") * F.col("g")).cast("long").alias("sumg2"),
    )
    live = tstat.select(
        "t", "s", (F.col("s") * F.col("sumg2") - F.col("sumg") * F.col("sumg")).alias("d")
    ).filter(F.col("d") > 0)
    a = grid.alias("a")
    b = grid.alias("b")
    terms = (
        a.join(b, (F.col("a.t") == F.col("b.t")) & (F.col("a.source") < F.col("b.source")))
        .join(F.broadcast(live.alias("live")), F.col("live.t") == F.col("a.t"))
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            F.floor(
                10000.0
                * F.col("live.s")
                * F.abs(F.col("a.g") - F.col("b.g"))
                / F.sqrt(F.col("live.d").cast("double"))
            )
            .cast("long")
            .alias("term4"),
        )
    )
    return (
        terms.groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.expr("CAST(sum(term4) AS BIGINT) div count(*)").alias("delta4"),
        )
        .orderBy("src_a", "src_b")
    )
