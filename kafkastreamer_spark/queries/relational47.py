"""Round-13 batch 256: dynamic-time-warping similarity, importance-
weight health, near-dup transitivity, and arrival-time uniformity.

* ``ts_dtw_daily_pairs`` — exact banded DTW distance between every
  pair of per-type daily-count series, computed as a JVM-side
  DP fold (nested F.aggregate / list_reduce — no Python, no
  explosion): the warping-tolerant series distance the blocked
  Euclidean pairs (ts_similarity_blocked_pairs) cannot express.
* ``sample_weight_ess_audit`` — effective sample size and
  max-weight share of the order-value importance weights (the same
  weight column sample_weighted_reservoir and sample_pps_systematic
  draw with): the standard "will importance sampling degenerate"
  diagnostic.
* ``dedup_pair_transitivity_audit`` — wedge-closure rate of the
  3-gram near-dup pair graph: how often (a~b, b~c) implies (a~c) at
  the shipped threshold — the measured assumption behind collapsing
  pairs into clusters (dedup_cluster_representatives drops every
  non-representative; that is only lossless if ~ is near-transitive).
* ``events_hour_uniformity_chi2`` — chi-square goodness-of-fit of
  event arrivals against the uniform hour-of-day model: the
  uniformity test behind the dow×hour profile (orders_chisq tests
  independence of two factors; this tests one factor against a
  NULL model).

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B timeseries /
sampling / LLM-dedup / statistics closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.operators.dedup import _ngram_jaccard_pairs
from kafkastreamer_spark.queries._util import SCALE, fixed
from kafkastreamer_spark.registry import REGISTRY, register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# ts_dtw_daily_pairs
# ---------------------------------------------------------------------------

_DTW_BIG = 10**15  # unreachable-cell sentinel (additions stay < 2^63)
_DTW_SLACK = 5  # Sakoe-Chiba band radius = |n_a - n_b| + slack


@register(
    "ts_dtw_daily_pairs",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        series AS (
            SELECT event_type, array_agg(cnt ORDER BY day) AS xs
            FROM daily GROUP BY event_type
        ),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   a.xs AS xa, b.xs AS xb,
                   CAST(abs(len(a.xs) - len(b.xs)) + {_DTW_SLACK} AS BIGINT)
                       AS r
            FROM series a JOIN series b ON a.event_type < b.event_type
        ),
        dp AS (
            SELECT type_a, type_b,
                   CAST(len(xa) AS BIGINT) AS n_a,
                   CAST(len(xb) AS BIGINT) AS n_b,
                   list_reduce(
                       list_prepend(
                           list_prepend(CAST(0 AS BIGINT),
                               list_transform(range(1, len(xb) + 1),
                                   j -> CAST({_DTW_BIG} AS BIGINT))),
                           list_transform(range(1, len(xa) + 1),
                               i -> [xa[CAST(i AS INT)], CAST(i AS BIGINT)])
                       ),
                       (prev, xi) -> list_reduce(
                           list_prepend(CAST([{_DTW_BIG}] AS BIGINT[]),
                               list_transform(range(1, len(xb) + 1),
                                   j -> [xb[CAST(j AS INT)], CAST(j AS BIGINT)])),
                           (acc2, xj) -> list_append(acc2,
                               CASE WHEN abs(xi[2] - xj[2]) > r
                                    THEN CAST({_DTW_BIG} AS BIGINT)
                                    ELSE abs(xi[1] - xj[1])
                                         + least(prev[CAST(xj[2] AS INT) + 1],
                                                 prev[CAST(xj[2] AS INT)],
                                                 acc2[len(acc2)])
                               END)
                       )
                   )[len(xb) + 1] AS dtw_cost
            FROM pairs
        )
        SELECT type_a, type_b, n_a, n_b, dtw_cost,
               (10000 * dtw_cost) // (n_a + n_b) AS dtw_norm4
        FROM dp ORDER BY type_a, type_b
    """,
    tags=("timeseries", "similarity", "iterative"),
)
def ts_dtw_daily_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dynamic-time-warping distance (|·| ground cost,
    Sakoe-Chiba band of radius |n_a − n_b| + 5) between the daily
    event-count series of every event-type pair. DTW aligns series
    that lead/lag or locally stretch — the warping the lead-lag
    cross-correlation (global shift only) and blocked Euclidean
    pairs (rigid alignment) both miss. The full DP runs INSIDE the
    engines as a nested fold (Spark: F.aggregate over the row arrays;
    DuckDB: list_reduce with the seed row prepended) — integer
    arithmetic end to end, so the cost matrix is bit-identical
    cross-engine; the band sentinel is a large-but-safe BIGINT whose
    additive drift over ≤ n+m steps cannot overflow.

    Scale shape: the fact table aggregates to calendar-bounded daily
    counts; series assemble per type (array of ≤ days-in-corpus
    longs) and the pairwise DP is |types|²-bounded scalar work per
    row — no row explosion for the O(n·m) table, it lives inside the
    fold. For long series the band bounds work at O(n·r).
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "cnt"))),
            lambda x: x["cnt"],
        ).alias("xs")
    )
    a = series.alias("a")
    b = series.alias("b")
    pairs = a.join(b, F.col("a.event_type") < F.col("b.event_type")).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.xs").alias("xa"),
        F.col("b.xs").alias("xb"),
        (
            F.abs(F.size("a.xs") - F.size("b.xs")) + F.lit(_DTW_SLACK)
        )
        .cast("long")
        .alias("r"),
    )

    big = F.lit(_DTW_BIG).cast("long")
    xa, xb, r = F.col("xa"), F.col("xb"), F.col("r")
    n, m = F.size(xa), F.size(xb)
    row0 = F.concat(
        F.array(F.lit(0).cast("long")),
        F.transform(F.sequence(F.lit(1), m), lambda j: big),
    )
    outer_items = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array(F.element_at(xa, i.cast("int")), i.cast("long")),
    )
    inner_items = F.transform(
        F.sequence(F.lit(1), m),
        lambda j: F.array(F.element_at(xb, j.cast("int")), j.cast("long")),
    )

    def outer_merge(prev, xi):
        def inner_merge(acc2, xj):
            jj = F.element_at(xj, 2).cast("int")
            cell = F.when(
                F.abs(F.element_at(xi, 2) - F.element_at(xj, 2)) > r, big
            ).otherwise(
                F.abs(F.element_at(xi, 1) - F.element_at(xj, 1))
                + F.least(
                    F.element_at(prev, jj + 1),
                    F.element_at(prev, jj),
                    F.element_at(acc2, F.size(acc2)),
                )
            )
            return F.concat(acc2, F.array(cell))

        return F.aggregate(inner_items, F.array(big), inner_merge)

    dtw_cost = F.element_at(
        F.aggregate(outer_items, row0, outer_merge), (m + 1).cast("int")
    )
    return (
        pairs.select(
            "type_a",
            "type_b",
            F.size("xa").cast("long").alias("n_a"),
            F.size("xb").cast("long").alias("n_b"),
            dtw_cost.alias("dtw_cost"),
        )
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "dtw_cost",
            F.expr("(10000 * dtw_cost) div (n_a + n_b)").alias("dtw_norm4"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# sample_weight_ess_audit
# ---------------------------------------------------------------------------


@register(
    "sample_weight_ess_audit",
    oracle="""
        WITH w AS (
            SELECT CAST(floor(o_totalprice) AS BIGINT) AS w
            FROM orders WHERE o_totalprice > 0
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(w) AS BIGINT) AS sw,
                   CAST(sum(w * w) AS BIGINT) AS sww,
                   CAST(max(w) AS BIGINT) AS maxw
            FROM w
        )
        SELECT n, sw, maxw,
               CAST(floor(CAST(sw AS DOUBLE) * sw / sww) AS BIGINT) AS ess,
               CAST(floor(10000.0 * (CAST(sw AS DOUBLE) * sw / sww) / n)
                    AS BIGINT) AS ess_ratio4,
               (10000 * maxw) // sw AS max_share4
        FROM s WHERE n > 0
    """,
    tags=("llm-data", "sampling", "audit"),
)
def sample_weight_ess_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the order-value importance weights
    (whole currency units — the same magnitude column the weighted
    reservoir and PPS entries sample by): ESS = (Σw)²/Σw², the
    Kish formula, with the ESS/n ratio and the largest single
    weight's share of total mass. A low ratio or a dominant weight
    means weighted draws degenerate to a handful of heavy orders —
    the diagnostic to check BEFORE trusting any importance-weighted
    estimate downstream. Moments are exact BIGINTs (whole-unit
    weights keep Σw² inside the long range at any fixture scale);
    ESS evaluates in double with the identical expression on both
    engines, so the floors agree exactly.

    Scale shape: one 4-number global aggregate over the fact table —
    map-side combined, nothing downstream exceeds one row.
    """
    o = load_table(spark, sf_dir, "orders")
    w = o.filter(F.col("o_totalprice") > 0).select(
        F.floor("o_totalprice").cast("long").alias("w")
    )
    s = w.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("w").cast("long").alias("sw"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("sww"),
        F.max("w").cast("long").alias("maxw"),
    )
    ess = F.col("sw").cast("double") * F.col("sw") / F.col("sww")
    return s.filter(F.col("n") > 0).select(
        "n",
        "sw",
        "maxw",
        F.floor(ess).cast("long").alias("ess"),
        F.floor(10000.0 * ess / F.col("n")).cast("long").alias("ess_ratio4"),
        F.expr("(10000 * maxw) div sw").alias("max_share4"),
    )


# ---------------------------------------------------------------------------
# dedup_pair_transitivity_audit
# ---------------------------------------------------------------------------


def _pairs_oracle_cte() -> str:
    """The dedup_ngram_jaccard oracle as a CTE body (same reuse
    pattern as dedup_cluster_representatives' _cluster_oracle)."""
    return REGISTRY["dedup_ngram_jaccard"].oracle.replace(
        "ORDER BY doc_a, doc_b", ""
    )


@register(
    "dedup_pair_transitivity_audit",
    oracle=f"""
        WITH pairs AS ({_pairs_oracle_cte()}),
        und AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        wedges AS (
            -- open wedge a-m-c with a < c (each unordered wedge once)
            SELECT e1.v AS m, e1.u AS a, e2.v AS c
            FROM und e1 JOIN und e2
              ON e1.v = e2.u AND e1.u < e2.v
        ),
        closed AS (
            SELECT w.a, w.c
            FROM wedges w JOIN pairs p
              ON p.doc_a = w.a AND p.doc_b = w.c
        ),
        s AS (
            SELECT CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_pairs,
                   CAST((SELECT count(*) FROM wedges) AS BIGINT) AS n_wedges,
                   CAST((SELECT count(*) FROM closed) AS BIGINT) AS n_closed
        )
        SELECT n_pairs, n_wedges, n_closed,
               CASE WHEN n_wedges > 0
                    THEN (10000 * n_closed) // n_wedges END AS closure4
        FROM s
    """,
    tags=("llm-data", "dedup", "audit"),
)
def dedup_pair_transitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wedge-closure rate of the 3-gram near-dup graph: over all open
    wedges a~m~c (unordered, counted once via a < c), the share whose
    endpoints are ALSO a near-dup pair at the shipped threshold. This
    is the measured assumption behind cluster consolidation —
    dedup_cluster_representatives keeps one doc per connected
    component, which only preserves corpus content if similarity is
    near-transitive inside components; a low closure rate here means
    chains of borderline pairs are gluing unrelated docs into one
    cluster (the known failure mode of threshold-graph dedup). NULL
    closure when the graph has no wedges (guarded on both sides).

    Scale shape: everything runs on the PAIR relation (near-dup
    pairs, already df-capped and banded upstream — orders of
    magnitude smaller than the corpus); the wedge join is
    pair-degree-bounded and the closure check is one equi-join back
    to the pair set.
    """
    pairs = _ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    pairs = pairs.persist()  # edges, wedge join, and closure share it
    und = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    wedges = e1.join(
        e2, (F.col("e1.v") == F.col("e2.u")) & (F.col("e1.u") < F.col("e2.v"))
    ).select(F.col("e1.u").alias("a"), F.col("e2.v").alias("c"))
    wedges = wedges.persist()  # counted + joined below
    closed = wedges.join(
        pairs,
        (F.col("doc_a") == F.col("a")) & (F.col("doc_b") == F.col("c")),
        "left_semi",
    )
    n_pairs = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    n_wedges = wedges.agg(F.count(F.lit(1)).cast("long").alias("n_wedges"))
    n_closed = closed.agg(F.count(F.lit(1)).cast("long").alias("n_closed"))
    return (
        n_pairs.crossJoin(F.broadcast(n_wedges))
        .crossJoin(F.broadcast(n_closed))
        .select(
            "n_pairs",
            "n_wedges",
            "n_closed",
            F.when(
                F.col("n_wedges") > 0,
                F.expr("(10000 * n_closed) div n_wedges"),
            ).alias("closure4"),
        )
    )


# ---------------------------------------------------------------------------
# events_hour_uniformity_chi2
# ---------------------------------------------------------------------------


@register(
    "events_hour_uniformity_chi2",
    oracle=f"""
        WITH hours AS (
            SELECT CAST(strftime(ts, '%H') AS BIGINT) AS h FROM events
        ),
        obs AS (
            SELECT g.h,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n
            FROM (SELECT unnest(range(0, 24)) AS h) g
            LEFT JOIN (SELECT h, count(*) AS n FROM hours GROUP BY h) c
              ON c.h = g.h
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs),
        terms AS (
            SELECT CAST(floor(
                       (n - CAST(total AS DOUBLE) / 24)
                     * (n - CAST(total AS DOUBLE) / 24)
                     / (CAST(total AS DOUBLE) / 24) * {SCALE}
                   ) AS BIGINT) AS t4
            FROM obs CROSS JOIN tot
        )
        SELECT CAST(23 AS BIGINT) AS dof,
               (SELECT total FROM tot) AS n_events,
               CAST(sum(t4) AS DOUBLE) / {SCALE} AS chi2
        FROM terms
    """,
    tags=("events", "statistics", "gof"),
)
def events_hour_uniformity_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit of event arrival hours against the
    uniform 24-hour model (all 24 cells kept via a dense hour grid,
    zero-count hours included — dof = 23): the arrival-seasonality
    TEST behind the descriptive dow×hour profile. orders_chisq tests
    independence of two observed factors; this tests one factor
    against an a-priori NULL model — the other half of the chi-square
    family. Per-cell terms floor to fixed-point BIGINT before the sum
    (the family's partial-aggregation-order discipline).

    Scale shape: one 24-bucket groupBy over the fact table with
    map-side combine, a dense-grid left join against the constant
    24-row hour spine, and a ≤24-row term rollup.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    counts = ev.select(
        F.date_format("ts", "HH").cast("long").alias("h")
    ).groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    grid = spark.range(0, 24).select(F.col("id").alias("h"))
    obs = (
        grid.join(counts, "h", "left")
        .select("h", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
    )
    obs = obs.persist()  # total + terms share it
    tot = obs.agg(F.sum("n").cast("long").alias("total"))
    exp = F.col("total").cast("double") / 24
    term = (F.col("n") - exp) * (F.col("n") - exp) / exp
    chi2 = (
        obs.crossJoin(F.broadcast(tot))
        .select(fixed(term).alias("t4"))
        .agg((F.sum("t4").cast("double") / SCALE).alias("chi2"))
    )
    return (
        tot.crossJoin(F.broadcast(chi2))
        .select(
            F.lit(23).cast("long").alias("dof"),
            F.col("total").alias("n_events"),
            "chi2",
        )
    )
