"""Round-13 batch 258: normality testing, windowed lexical diversity,
whole-distribution drift, and global graph transitivity.

* ``stats_jarque_bera`` — the Jarque–Bera normality test on event
  values per type: skewness² + kurtosis²/4 from exact integer
  moments — the omnibus "is this even Gaussian" gate that decides
  whether the parametric entries (Welch t, OLS) can be trusted.
* ``text_mattr_diversity`` — moving-average type-token ratio
  (MATTR, 50-token windows) per source: the length-invariant
  lexical-diversity standard; plain TTR (text_lexical_diversity)
  shrinks with document length, MATTR doesn't.
* ``stats_cramer_von_mises`` — two-sample Cramér–von Mises drift
  statistic per event type on the first-half/second-half split:
  integrates the SQUARED CDF gap over the whole distribution where
  KS (events_ks_drift) takes only the max gap — tail drifts that
  never produce a single large gap show up here first.
* ``graph_global_transitivity`` — the global clustering coefficient
  3·triangles/wedges of the nation trade graph: one number beside
  the per-nation triangle counts and per-node local coefficients.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B statistics /
text / graph closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import SQL_TOKENS, tokens
from kafkastreamer_spark.queries._util import SCALE, fixed
from kafkastreamer_spark.queries.graph import _TRADE_EDGES_SQL, _trade_edges
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# stats_jarque_bera
# ---------------------------------------------------------------------------


@register(
    "stats_jarque_bera",
    oracle="""
        WITH vals AS (
            SELECT event_type, CAST(floor(value) AS BIGINT) AS v
            FROM events
        ),
        anchor AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v) AS BIGINT) // count(*) AS m0
            FROM vals GROUP BY event_type
        ),
        devs AS (
            SELECT v.event_type, a.n, v.v - a.m0 AS d
            FROM vals v JOIN anchor a ON a.event_type = v.event_type
        ),
        mom AS (
            SELECT event_type, n,
                   CAST(sum(d) AS BIGINT) AS t1,
                   CAST(sum(d * d) AS BIGINT) AS t2,
                   CAST(sum(d * d * d) AS BIGINT) AS t3,
                   CAST(sum(d * d * d * d) AS BIGINT) AS t4
            FROM devs GROUP BY event_type, n
        ),
        cm AS (
            SELECT event_type, n,
                   CAST(t2 AS DOUBLE) / n
                     - (CAST(t1 AS DOUBLE) / n) * (CAST(t1 AS DOUBLE) / n)
                       AS mu2,
                   CAST(t3 AS DOUBLE) / n
                     - 3 * (CAST(t1 AS DOUBLE) / n) * (CAST(t2 AS DOUBLE) / n)
                     + 2 * (CAST(t1 AS DOUBLE) / n)
                         * (CAST(t1 AS DOUBLE) / n)
                         * (CAST(t1 AS DOUBLE) / n) AS mu3,
                   CAST(t4 AS DOUBLE) / n
                     - 4 * (CAST(t1 AS DOUBLE) / n) * (CAST(t3 AS DOUBLE) / n)
                     + 6 * (CAST(t1 AS DOUBLE) / n)
                         * (CAST(t1 AS DOUBLE) / n) * (CAST(t2 AS DOUBLE) / n)
                     - 3 * (CAST(t1 AS DOUBLE) / n)
                         * (CAST(t1 AS DOUBLE) / n)
                         * (CAST(t1 AS DOUBLE) / n)
                         * (CAST(t1 AS DOUBLE) / n) AS mu4
            FROM mom
        )
        SELECT event_type, n,
               CAST(floor(10000.0 * (mu3 / sqrt(mu2 * mu2 * mu2)))
                    AS BIGINT) AS skew4,
               CAST(floor(10000.0 * (mu4 / (mu2 * mu2) - 3.0))
                    AS BIGINT) AS ex_kurt4,
               CAST(floor((CAST(n AS DOUBLE) / 6.0)
                    * ((mu3 / sqrt(mu2 * mu2 * mu2))
                       * (mu3 / sqrt(mu2 * mu2 * mu2))
                       + (mu4 / (mu2 * mu2) - 3.0)
                         * (mu4 / (mu2 * mu2) - 3.0) / 4.0))
                    AS BIGINT) AS jb
        FROM cm WHERE n > 3 AND mu2 > 0 ORDER BY event_type
    """,
    tags=("statistics", "events", "gof"),
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test per event type on whole-currency
    values: JB = n/6 * (S^2 + K^2/4) from sample skewness S and excess
    kurtosis K. Under normality JB ~ chi^2(2), so JB >> 6 rejects —
    the omnibus gate that says whether the parametric entries (Welch
    t, OLS trend, I-MR constants) are applicable to this column at
    all. Exactness: values quantize to whole units and center on the
    INTEGER anchor m0 = floor-mean (exact both engines), so every
    power sum up to d^4 is an exact BIGINT at any fixture scale
    (|d| <= ~600 here, sum d^4 < 2^60 even at 10^8 rows); the central
    moments around the true mean come from the shift identities over
    those exact sums, evaluated with the identical IEEE expression on
    both engines. Degenerate zero-variance/tiny types are guarded.

    Scale shape: one anchor aggregate + one moment aggregate over the
    fact table (both map-side combined; the anchor broadcasts), then
    per-type scalar arithmetic on a |types|-row relation.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    vals = ev.select("event_type", F.floor("value").cast("long").alias("v"))
    anchor = vals.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(v) AS BIGINT) div count(*)").alias("m0"),
    )
    devs = vals.join(F.broadcast(anchor), "event_type").select(
        "event_type", "n", (F.col("v") - F.col("m0")).alias("d")
    )
    mom = devs.groupBy("event_type", "n").agg(
        F.sum("d").cast("long").alias("t1"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("t2"),
        F.sum(F.col("d") * F.col("d") * F.col("d")).cast("long").alias("t3"),
        F.sum(F.col("d") * F.col("d") * F.col("d") * F.col("d"))
        .cast("long")
        .alias("t4"),
    )
    n = F.col("n")
    a1 = F.col("t1").cast("double") / n
    a2 = F.col("t2").cast("double") / n
    a3 = F.col("t3").cast("double") / n
    a4 = F.col("t4").cast("double") / n
    mu2 = a2 - a1 * a1
    mu3 = a3 - 3 * a1 * a2 + 2 * a1 * a1 * a1
    mu4 = a4 - 4 * a1 * a3 + 6 * a1 * a1 * a2 - 3 * a1 * a1 * a1 * a1
    skew = mu3 / F.sqrt(mu2 * mu2 * mu2)
    exk = mu4 / (mu2 * mu2) - 3.0
    return (
        mom.filter((n > 3) & (mu2 > 0))
        .select(
            "event_type",
            "n",
            F.floor(10000.0 * skew).cast("long").alias("skew4"),
            F.floor(10000.0 * exk).cast("long").alias("ex_kurt4"),
            F.floor(
                (n.cast("double") / 6.0) * (skew * skew + exk * exk / 4.0)
            )
            .cast("long")
            .alias("jb"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# text_mattr_diversity
# ---------------------------------------------------------------------------

_MATTR_W = 50  # moving-window width in tokens


@register(
    "text_mattr_diversity",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, source, {SQL_TOKENS} AS w FROM documents
        ),
        per_doc AS (
            SELECT doc_id, source,
                   CAST(len(w) AS BIGINT) AS n_tokens,
                   CASE WHEN len(w) >= {_MATTR_W} THEN
                       CAST(list_sum(list_transform(
                           range(1, len(w) - {_MATTR_W} + 2),
                           i -> len(list_distinct(w[i:i+{_MATTR_W}-1]))
                       )) AS BIGINT)
                   END AS distinct_sum,
                   CASE WHEN len(w) >= {_MATTR_W}
                        THEN CAST(len(w) - {_MATTR_W} + 1 AS BIGINT)
                   END AS n_windows
            FROM tok
        )
        SELECT source,
               CAST(count(distinct_sum) AS BIGINT) AS n_docs_windowed,
               CAST(COALESCE(sum(distinct_sum), 0) AS BIGINT) AS distinct_sum,
               CAST(COALESCE(sum(n_windows), 0) AS BIGINT) AS n_windows,
               CASE WHEN COALESCE(sum(n_windows), 0) > 0 THEN
                   (10000 * COALESCE(sum(distinct_sum), 0))
                       // ({_MATTR_W} * sum(n_windows)) END AS mattr4
        FROM per_doc GROUP BY source ORDER BY source
    """,
    tags=("llm-data", "text", "richness"),
)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average type-token ratio per source (MATTR, Covington &
    McFall): the mean distinct-token count over every 50-token
    sliding window, divided by the window width — the
    length-invariant lexical-diversity standard. Documents shorter
    than one window contribute nothing (the standard treatment);
    counts are exact integers and the final ratio is one integer
    division over the source rollup. On this fixture's ~31-token
    vocabulary MATTR is far below 1 by construction — the same
    degeneracy Yule's K reads as enormous repeat-rate.

    Scale shape: the window scan is per-row ARRAY work (slice +
    distinct per offset — O(tokens·W) lambda steps inside the JVM,
    no row explosion); the only shuffle is the |sources|-bounded
    rollup.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    wcol = tokens("text")
    n = F.size("w")
    windows = F.transform(
        F.sequence(F.lit(1), n - _MATTR_W + 1),
        lambda i: F.size(
            F.array_distinct(F.slice(F.col("w"), i, _MATTR_W))
        ).cast("long"),
    )
    per_doc = d.select("doc_id", "source", wcol.alias("w")).select(
        "source",
        n.cast("long").alias("n_tokens"),
        F.when(
            n >= _MATTR_W,
            F.aggregate(windows, F.lit(0).cast("long"), lambda a, x: a + x),
        ).alias("distinct_sum"),
        F.when(n >= _MATTR_W, (n - _MATTR_W + 1).cast("long")).alias(
            "n_windows"
        ),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("distinct_sum").cast("long").alias("n_docs_windowed"),
            F.coalesce(F.sum("distinct_sum"), F.lit(0))
            .cast("long")
            .alias("distinct_sum"),
            F.coalesce(F.sum("n_windows"), F.lit(0))
            .cast("long")
            .alias("n_windows"),
        )
        .select(
            "source",
            "n_docs_windowed",
            "distinct_sum",
            "n_windows",
            F.when(
                F.col("n_windows") > 0,
                F.expr(f"(10000 * distinct_sum) div ({_MATTR_W} * n_windows)"),
            ).alias("mattr4"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# stats_cramer_von_mises
# ---------------------------------------------------------------------------


@register(
    "stats_cramer_von_mises",
    oracle=f"""
        WITH v AS (
            SELECT event_type,
                   CAST(FLOOR(value * 10000) AS BIGINT) AS v_fp,
                   CASE WHEN event_id * 2 <
                        (SELECT max(event_id) + 1 FROM events)
                        THEN 1 ELSE 2 END AS period
            FROM events
        ),
        perval AS (
            SELECT event_type, v_fp,
                   count(*) FILTER (WHERE period = 1) AS d1,
                   count(*) FILTER (WHERE period = 2) AS d2
            FROM v GROUP BY event_type, v_fp
        ),
        cdf AS (
            SELECT event_type, v_fp, d1 + d2 AS dv,
                   CAST(sum(d1) OVER w AS BIGINT) AS c1,
                   CAST(sum(d2) OVER w AS BIGINT) AS c2,
                   CAST(sum(d1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
                   CAST(sum(d2) OVER (PARTITION BY event_type) AS BIGINT) AS n2
            FROM perval
            WINDOW w AS (PARTITION BY event_type ORDER BY v_fp
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        terms AS (
            -- per-distinct-value fp4 floor BEFORE the sum (the
            -- chi-square family's order-independence discipline)
            SELECT event_type, n1, n2,
                   CAST(floor({SCALE}
                        * (CAST(dv AS DOUBLE) / (n1 + n2))
                        * ((CAST(c1 AS DOUBLE) * n2 - CAST(c2 AS DOUBLE) * n1)
                           / (CAST(n1 AS DOUBLE) * n2))
                        * ((CAST(c1 AS DOUBLE) * n2 - CAST(c2 AS DOUBLE) * n1)
                           / (CAST(n1 AS DOUBLE) * n2))
                   ) AS BIGINT) AS t4
            FROM cdf
        )
        SELECT event_type, min(n1) AS n1, min(n2) AS n2,
               CAST(floor((CAST(min(n1) AS DOUBLE) * min(n2)
                           / ((min(n1) + min(n2)) * (min(n1) + min(n2))))
                          * sum(t4)) AS BIGINT) AS cvm4
        FROM terms
        WHERE n1 > 0 AND n2 > 0
        GROUP BY event_type ORDER BY event_type
    """,
    tags=("statistics", "drift", "events"),
)
def stats_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises drift statistic per event type on
    the same first-half/second-half event_id split as events_ks_drift:
    ω² ≈ (n₁n₂/(n₁+n₂)²) · Σ_v (dᵥ/(n₁+n₂)) · ΔF(v)² — the
    pooled-weighted integral of the SQUARED CDF gap. KS flags the
    single worst value; CvM accumulates drift spread across the whole
    support, catching broad low-amplitude shifts KS dilutes. Per
    distinct value the gap term floors to fixed point BEFORE the sum
    (the chi-square family's partial-aggregation-order discipline;
    the quantization error is bounded by 1e-4 per distinct value and
    identical cross-engine), and the outer n₁n₂/(n₁+n₂)² factor
    applies once per type.

    Scale shape: identical to the KS entry — one (type, value)
    pre-aggregation with map-side combine, one type-partitioned
    cumulative window over the collapsed relation, one rollup.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    nmax = ev.agg((F.max("event_id") + 1).alias("nall"))
    v = ev.crossJoin(F.broadcast(nmax)).select(
        "event_type",
        F.floor(F.col("value") * 10000).cast("long").alias("v_fp"),
        F.when(F.col("event_id") * 2 < F.col("nall"), 1)
        .otherwise(2)
        .alias("period"),
    )
    perval = v.groupBy("event_type", "v_fp").agg(
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("period") == 2, 1).otherwise(0)).alias("d2"),
    )
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("v_fp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cdf = perval.select(
        "event_type",
        (F.col("d1") + F.col("d2")).alias("dv"),
        F.sum("d1").over(wrun).cast("long").alias("c1"),
        F.sum("d2").over(wrun).cast("long").alias("c2"),
        F.sum("d1").over(wall).cast("long").alias("n1"),
        F.sum("d2").over(wall).cast("long").alias("n2"),
    )
    gap = (
        F.col("c1").cast("double") * F.col("n2")
        - F.col("c2").cast("double") * F.col("n1")
    ) / (F.col("n1").cast("double") * F.col("n2"))
    t4 = F.floor(
        SCALE * (F.col("dv").cast("double") / (F.col("n1") + F.col("n2"))) * gap * gap
    ).cast("long")
    return (
        cdf.select("event_type", "n1", "n2", t4.alias("t4"))
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .groupBy("event_type")
        .agg(
            F.min("n1").alias("n1"),
            F.min("n2").alias("n2"),
            F.floor(
                (
                    F.min("n1").cast("double")
                    * F.min("n2")
                    / (
                        (F.min("n1") + F.min("n2"))
                        * (F.min("n1") + F.min("n2"))
                    )
                )
                * F.sum("t4")
            )
            .cast("long")
            .alias("cvm4"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# graph_global_transitivity
# ---------------------------------------------------------------------------


@register(
    "graph_global_transitivity",
    oracle=f"""
        WITH und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM ({_TRADE_EDGES_SQL})
            WHERE src <> dst
        ),
        tri AS (
            SELECT count(*) AS n_tri
            FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        deg AS (
            SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
                SELECT a AS node FROM und UNION ALL SELECT b FROM und
            ) GROUP BY node
        ),
        wed AS (
            SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg
        )
        SELECT CAST(tri.n_tri AS BIGINT) AS n_triangles,
               wed.n_wedges,
               (10000 * 3 * tri.n_tri) // wed.n_wedges AS transitivity4
        FROM tri CROSS JOIN wed WHERE wed.n_wedges > 0
    """,
    tags=("graph", "triangles", "statistics"),
)
def graph_global_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient of the undirected nation trade
    graph: 3·triangles / wedges, with triangles from the same ordered
    (a < b < c) 3-way join as graph_triangle_count and wedges as
    Σ C(deg, 2) over the degree relation. One number for "do my
    trade partners trade with each other" — the graph-level summary
    the per-nation triangle table and per-node local coefficients
    roll up to (the n-weighted local mean ≠ this ratio; both are
    standard, this is the 'ratio of counts' form).

    Scale shape: the nation graph is ≤25 nodes (the dimension joins
    collapse lineitem before anything quadratic); triangle join,
    degree count, and the final ratio are all bounded-domain work.
    """
    edges = _trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    und = und.persist()  # 3-way join + degree count share it
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    wed = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges")
    )
    return (
        tri.crossJoin(F.broadcast(wed))
        .filter(F.col("n_wedges") > 0)
        .select(
            "n_triangles",
            "n_wedges",
            F.expr("(10000 * 3 * n_triangles) div n_wedges").alias(
                "transitivity4"
            ),
        )
    )
