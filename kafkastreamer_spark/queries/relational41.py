"""Round-12 batch 250: paired sign testing, two-way variance
decomposition, near-dup neighborhood profiling, and equal-mass
calibration error.

* ``stats_sign_test`` — the paired sign test on first-half vs
  second-half per-user activity: the assumption-free companion of
  the Wilcoxon/rank entries for "did behavior shift within users".
* ``stats_two_way_anova`` — two-way sums-of-squares decomposition of
  lineitem quantity over (returnflag × linestatus): marginal,
  cell-explained, and residual variance with eta², all in exact
  fixed point via the mod-decomposition identity (no overflow at any
  fixture scale).
* ``dedup_neighbor_degree_histogram`` — how many near-dup neighbors
  each document has (3-gram Jaccard pairs), banded — the
  neighborhood view of duplication that cluster-size histograms
  (component grain) and pair lists (edge grain) both miss.
* ``ml_ece_adaptive_bins`` — expected calibration error on
  EQUAL-MASS score deciles (ntile over the total (score desc,
  user_id) order): the adaptive-bin ECE that avoids the
  empty/starved fixed bins of ml_calibration_bins.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B statistics /
ML-evaluation / LLM-dedup reporting closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators.dedup import _ngram_jaccard_pairs
from kafkastreamer_spark.queries.relational16 import _PER_USER_SQL, _per_user
from kafkastreamer_spark.registry import REGISTRY, register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# stats_sign_test
# ---------------------------------------------------------------------------


@register(
    "stats_sign_test",
    oracle="""
        WITH anchor AS (
            -- 2*mid in exact integer microseconds: no interval
            -- division, no sub-microsecond rounding to disagree on
            SELECT epoch_us(min(ts)) + epoch_us(max(ts)) AS mid2 FROM events
        ),
        per_user AS (
            SELECT user_id,
                   CAST(count_if(2 * epoch_us(e.ts) < anchor.mid2)
                        AS BIGINT) AS h1,
                   CAST(count_if(2 * epoch_us(e.ts) >= anchor.mid2)
                        AS BIGINT) AS h2
            FROM events e CROSS JOIN anchor GROUP BY 1
        ),
        s AS (
            SELECT CAST(count_if(h2 > h1) AS BIGINT) AS n_up,
                   CAST(count_if(h2 < h1) AS BIGINT) AS n_down,
                   CAST(count_if(h2 = h1) AS BIGINT) AS n_tied
            FROM per_user
        )
        SELECT n_up, n_down, n_tied,
               CASE WHEN n_up + n_down = 0 THEN CAST(0 AS BIGINT)
                    ELSE ((n_up - n_down) * (n_up - n_down) * 10000)
                         // (n_up + n_down)
               END AS chi2_fp4
        FROM s
    """,
    tags=("statistics", "hypothesis-test", "events"),
)
def stats_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test: did each user's activity shift between the
    first and second half of the observation window (midpoint of the
    corpus time span)? Ties discarded per the classic test; under H0
    the up/down split is Binomial(n, 1/2), and the continuity-free
    chi-square form (n_up − n_down)²/(n_up + n_down) is its χ²(1)
    approximation — the assumption-free companion of the
    Mann-Whitney/Wilcoxon entries (which need exchangeable
    magnitudes; the sign test needs only signs).

    Scale shape: one groupBy(user_id) conditional pass against a
    broadcast 1-row midpoint, one 3-counter aggregate, 1-row output.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    anchor = ev.agg(
        (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))).alias("mid2")
    )
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.count_if(2 * F.unix_micros(F.col("ts")) < F.col("mid2"))
            .cast("long")
            .alias("h1"),
            F.count_if(2 * F.unix_micros(F.col("ts")) >= F.col("mid2"))
            .cast("long")
            .alias("h2"),
        )
    )
    s = per_user.agg(
        F.count_if(F.col("h2") > F.col("h1")).cast("long").alias("n_up"),
        F.count_if(F.col("h2") < F.col("h1")).cast("long").alias("n_down"),
        F.count_if(F.col("h2") == F.col("h1")).cast("long").alias("n_tied"),
    )
    return s.select(
        "n_up",
        "n_down",
        "n_tied",
        F.when(F.expr("n_up + n_down") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "((n_up - n_down) * (n_up - n_down) * 10000) div (n_up + n_down)"
            ).cast("long")
        )
        .alias("chi2_fp4"),
    )


# ---------------------------------------------------------------------------
# stats_two_way_anova
# ---------------------------------------------------------------------------

# exact floor(10^4 * T^2 / n) without overflow at any scale:
# T^2 = n*q + r  =>  floor = 10^4*q + floor(10^4*r/n)
def _sq_over_n(t: str, n: str) -> str:
    return (
        f"(10000 * (({t} * {t}) // {n})"
        f" + (10000 * (({t} * {t}) % {n})) // {n})"
    )


def _sq_over_n_spark(t: str, n: str) -> str:
    return (
        f"(10000 * (({t} * {t}) div {n})"
        f" + (10000 * (({t} * {t}) % {n})) div {n})"
    )


@register(
    "stats_two_way_anova",
    oracle=f"""
        WITH base AS (
            SELECT l_returnflag AS fa, l_linestatus AS fb,
                   CAST(FLOOR(l_quantity) AS BIGINT) AS q
            FROM lineitem
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS t,
                   CAST(sum(q * q) AS BIGINT) AS qq
            FROM base
        ),
        a AS (
            SELECT CAST(sum({_sq_over_n("ta", "na")}) AS BIGINT) AS ssa_part
            FROM (SELECT fa, CAST(sum(q) AS BIGINT) AS ta,
                         CAST(count(*) AS BIGINT) AS na
                  FROM base GROUP BY fa)
        ),
        b AS (
            SELECT CAST(sum({_sq_over_n("tb", "nb")}) AS BIGINT) AS ssb_part
            FROM (SELECT fb, CAST(sum(q) AS BIGINT) AS tb,
                         CAST(count(*) AS BIGINT) AS nb
                  FROM base GROUP BY fb)
        ),
        c AS (
            SELECT CAST(sum({_sq_over_n("tc", "nc")}) AS BIGINT) AS ssc_part
            FROM (SELECT fa, fb, CAST(sum(q) AS BIGINT) AS tc,
                         CAST(count(*) AS BIGINT) AS nc
                  FROM base GROUP BY fa, fb)
        )
        SELECT tot.n AS n_rows,
               10000 * tot.qq - {_sq_over_n("tot.t", "tot.n")} AS ss_total_fp4,
               a.ssa_part - {_sq_over_n("tot.t", "tot.n")} AS ssa_fp4,
               b.ssb_part - {_sq_over_n("tot.t", "tot.n")} AS ssb_fp4,
               c.ssc_part - {_sq_over_n("tot.t", "tot.n")} AS ss_cells_fp4,
               10000 * tot.qq - c.ssc_part AS sse_fp4,
               (10000 * (c.ssc_part - {_sq_over_n("tot.t", "tot.n")}))
                   // (10000 * tot.qq - {_sq_over_n("tot.t", "tot.n")})
                   AS eta2_fp4
        FROM tot CROSS JOIN a CROSS JOIN b CROSS JOIN c
    """,
    tags=("statistics", "anova", "lineitem"),
)
def stats_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way sums-of-squares decomposition of lineitem quantity over
    (returnflag × linestatus): total SS, the unadjusted marginal SS
    of each factor (Type-I first-position sums — the design is
    unbalanced, so these attribute shared variance to whichever
    factor is read first; documented, not hidden), the cell-explained
    SS, the residual, and eta² (cells-explained share). The variance
    -decomposition capstone beside the one-way Kruskal-Wallis (rank
    ANOVA) and the chi-square family (counts, not magnitudes).

    Exactness & overflow: every Σ(T²/n) term uses the
    mod-decomposition identity floor(10⁴T²/n) = 10⁴·(T² div n) +
    (10⁴·(T² mod n)) div n — exact, and bounded by ~10⁴·Σq²
    regardless of scale (the naive 10⁴·T² overflows BIGINT past
    ~sf0.3).

    Scale shape: four map-side-combined aggregations of one scan
    (grand, two marginals, cells — ≤ a few dozen groups each), 1-row
    output, no joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("fa"),
        F.col("l_linestatus").alias("fb"),
        F.floor(F.col("l_quantity")).cast("long").alias("q"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("t"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("qq"),
    )

    def part(keys: list[str], alias: str) -> DataFrame:
        g = base.groupBy(*keys).agg(
            F.sum("q").cast("long").alias("tg"),
            F.count(F.lit(1)).cast("long").alias("ng"),
        )
        return g.agg(
            F.sum(F.expr(_sq_over_n_spark("tg", "ng"))).cast("long").alias(alias)
        )

    a = part(["fa"], "ssa_part")
    b = part(["fb"], "ssb_part")
    c = part(["fa", "fb"], "ssc_part")
    cf = _sq_over_n_spark("t", "n")  # correction factor 10^4 T^2/N
    return (
        tot.crossJoin(F.broadcast(a))
        .crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(c))
        .select(
            F.col("n").alias("n_rows"),
            F.expr(f"10000 * qq - {cf}").cast("long").alias("ss_total_fp4"),
            F.expr(f"ssa_part - {cf}").cast("long").alias("ssa_fp4"),
            F.expr(f"ssb_part - {cf}").cast("long").alias("ssb_fp4"),
            F.expr(f"ssc_part - {cf}").cast("long").alias("ss_cells_fp4"),
            F.expr("10000 * qq - ssc_part").cast("long").alias("sse_fp4"),
            F.expr(
                f"(10000 * (ssc_part - {cf})) div (10000 * qq - {cf})"
            )
            .cast("long")
            .alias("eta2_fp4"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_neighbor_degree_histogram
# ---------------------------------------------------------------------------

_DEG_CASE = """
    CASE WHEN deg = 1 THEN 1 WHEN deg <= 3 THEN 2
         WHEN deg <= 10 THEN 4 ELSE 11 END
"""

# the shared near-dup pair SQL (the dedup_ngram_jaccard oracle is
# registered before this module loads — same splice as the cluster
# oracle in operators/dedup.py)
_PAIRS_SQL = REGISTRY["dedup_ngram_jaccard"].oracle.replace(
    "ORDER BY doc_a, doc_b", ""
)


@register(
    "dedup_neighbor_degree_histogram",
    oracle=f"""
        WITH pairs AS ({_PAIRS_SQL}),
        und AS (
            SELECT doc_a AS d FROM pairs
            UNION ALL SELECT doc_b FROM pairs
        ),
        deg AS (
            SELECT d, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY d
        ),
        banded AS (SELECT {_DEG_CASE} AS band_lo, deg FROM deg)
        SELECT CAST(band_lo AS BIGINT) AS band_lo,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(deg) AS BIGINT) AS sum_deg,
               CAST(max(deg) AS BIGINT) AS max_deg
        FROM banded GROUP BY band_lo ORDER BY band_lo
    """,
    tags=("llm-data", "dedup", "reporting"),
)
def dedup_neighbor_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup NEIGHBORHOOD profile: per document with at least one
    3-gram-Jaccard near-dup, how many neighbors it has, banded (1 /
    2-3 / 4-10 / 11+). Pair lists (dedup_ngram_jaccard) answer
    "which pairs", component histograms
    (dedup_cluster_size_histogram, exact-hash grain) answer "how big
    are the groups"; the degree view answers "is duplication
    pairwise or hub-shaped" — hubs (template pages matching
    everything) are cleaned by excision, pairwise dups by keep-one,
    so the band profile picks the remediation.

    Scale shape: the shared near-dup pair pipeline, then a
    doubled-edge count per doc (map-side combined) and a ≤4-row band
    rollup.
    """
    pairs = _ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    und = pairs.select(F.col("doc_a").alias("d")).unionAll(
        pairs.select(F.col("doc_b").alias("d"))
    )
    deg = und.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    return (
        deg.select(F.expr(_DEG_CASE).alias("band_lo"), "deg")
        .groupBy("band_lo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("deg").cast("long").alias("sum_deg"),
            F.max("deg").cast("long").alias("max_deg"),
        )
        .select(F.col("band_lo").cast("long"), "n_docs", "sum_deg", "max_deg")
        .orderBy("band_lo")
    )


# ---------------------------------------------------------------------------
# ml_ece_adaptive_bins
# ---------------------------------------------------------------------------

_N_ABINS = 10


@register(
    "ml_ece_adaptive_bins",
    oracle=f"""
        WITH per_user AS ({_PER_USER_SQL}),
        binned AS (
            SELECT least(score, 10) AS p10, y,
                   NTILE({_N_ABINS}) OVER (ORDER BY score DESC, user_id)
                       AS abin
            FROM per_user
        ),
        g AS (
            SELECT abin, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS pos,
                   CAST(sum(p10) AS BIGINT) AS sp10
            FROM binned GROUP BY abin
        ),
        rows_ AS (
            SELECT abin, n, pos,
                   (1000 * sp10) // n AS pred_fp4,
                   (10000 * pos) // n AS obs_fp4,
                   abs((1000 * sp10) // n - (10000 * pos) // n) AS gap_fp4
            FROM g
        ),
        e AS (
            SELECT CAST(sum(n * gap_fp4) // sum(n) AS BIGINT) AS ece_fp4
            FROM rows_
        )
        SELECT abin, n AS n_users, pos AS n_pos,
               pred_fp4, obs_fp4, gap_fp4, e.ece_fp4
        FROM rows_ CROSS JOIN e ORDER BY abin
    """,
    tags=("ml", "evaluation", "calibration"),
)
def ml_ece_adaptive_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-mass (adaptive-bin) expected calibration error: users
    sorted by score (desc, user_id tie-break — a total order, so
    NTILE is deterministic cross-engine) split into _N_ABINS=10
    equal-population bins; per bin the mean predicted probability
    (mean of min(score,10)/10, floored at fp4) vs observed rate, and
    the n-weighted ECE. Fixed-width bins (ml_calibration_bins) starve
    the tails and let dense bins dominate; equal-mass binning is the
    standard adaptive alternative — reading the two ECEs together
    separates binning artifact from real miscalibration.

    Scale shape: the one global window runs over one row per user
    (the derived small relation), then a 10-row (_N_ABINS) rollup with a
    broadcast 1-row ECE.
    """
    pu = _per_user(spark, sf_dir)
    binned = pu.select(
        F.least("score", F.lit(10)).alias("p10"),
        "y",
        F.ntile(_N_ABINS)
        .over(Window.orderBy(F.desc("score"), "user_id"))
        .alias("abin"),
    )
    g = binned.groupBy("abin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
        F.sum("p10").cast("long").alias("sp10"),
    )
    rows = g.select(
        "abin",
        "n",
        "pos",
        F.expr("(1000 * sp10) div n").alias("pred_fp4"),
        F.expr("(10000 * pos) div n").alias("obs_fp4"),
        F.abs(
            F.expr("(1000 * sp10) div n") - F.expr("(10000 * pos) div n")
        ).alias("gap_fp4"),
    )
    e = rows.agg(F.expr("sum(n * gap_fp4) div sum(n)").alias("ece_fp4"))
    return (
        rows.crossJoin(F.broadcast(e))
        .select(
            "abin",
            F.col("n").alias("n_users"),
            F.col("pos").alias("n_pos"),
            "pred_fp4",
            "obs_fp4",
            "gap_fp4",
            "ece_fp4",
        )
        .orderBy("abin")
    )
