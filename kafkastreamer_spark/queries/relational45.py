"""Round-13 batch 254: LSH capacity planning, SPC on monthly revenue,
ANN hubness pathology, and rare-event interval control.

* ``dedup_lsh_band_occupancy`` — per-band bucket-occupancy histogram
  of the MinHash LSH table (same 12-perm/4-band construction as
  dedup_minhash_lsh) with exact candidate-pair counts: the
  capacity-planning instrument — the recall audit says what LSH
  finds, the s-curve says what it should find, occupancy says what
  it will COST.
* ``orders_imr_control`` — individuals/moving-range (I-MR) control
  chart over monthly order revenue: exact-integer 2.66·MR̄ limits and
  out-of-control month counts — the SPC completion next to the
  supplier x̄-R and p-charts, on the revenue series the forecasting
  entries model.
* ``embedding_hubness_audit`` — reverse-k-occurrence (in-degree)
  histogram of the bucketed top-k candidate graph: hub vectors that
  appear in many neighbor lists are the classic ANN pathology that
  silently skews k-NN label accuracy and dedup transitivity.
* ``events_g_chart_intervals`` — g-chart statistics over the count
  of events between consecutive errors per user: the rare-event SPC
  view (geometric intervals) complementing MTBF (time between) with
  opportunity-count between.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B LLM-dedup /
SPC / ANN-diagnostics closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import (
    SQL_TOKENS,
    band_sigs,
    hyperplane_bucket,
    minhash_array,
    sql_minhash_ctes,
    sql_shingles,
)
from kafkastreamer_spark.operators.dedup import (
    _N_PLANES,
    _SQL_PLANE_COMP,
    MINHASH_BANDS,
    MINHASH_PERMS,
    _shingle_sets,
)
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# dedup_lsh_band_occupancy
# ---------------------------------------------------------------------------


@register(
    "dedup_lsh_band_occupancy",
    oracle=f"""
        WITH words AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
        sh AS (SELECT doc_id, {sql_shingles('w')} AS sh FROM words
               WHERE len(w) >= 3),
        posting AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        {sql_minhash_ctes(MINHASH_PERMS)},
        bands AS (
            SELECT doc_id, p // {MINHASH_PERMS // MINHASH_BANDS} AS band,
                   string_agg(mh, '|' ORDER BY p) AS sig
            FROM minhash GROUP BY 1, 2
        ),
        occ AS (
            SELECT band, sig, CAST(count(*) AS BIGINT) AS c
            FROM bands GROUP BY 1, 2
        )
        SELECT CAST(band AS BIGINT) AS band,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(count_if(c = 1) AS BIGINT) AS n_singleton,
               CAST(max(c) AS BIGINT) AS max_occupancy,
               CAST(sum(c * (c - 1) // 2) AS BIGINT) AS candidate_pairs
        FROM occ GROUP BY band ORDER BY band
    """,
    tags=("llm-data", "dedup", "lsh", "audit"),
)
def dedup_lsh_band_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-occupancy profile of the MinHash LSH table, per band
    (identical 12-permutation / 4-band construction and signatures as
    dedup_minhash_lsh): bucket count, singleton share, the largest
    bucket, and the EXACT candidate-pair volume Σ C(c,2) each band
    will feed the verifier. This is the capacity-planning number — a
    band whose max occupancy grows superlinearly with the corpus is
    the hot-bucket pathology that turns LSH from candidate pruning
    into an all-pairs join, and it shows up here before it shows up
    as a blown-up verify stage.

    Scale shape: signature build is the same pure map stage as
    dedup_minhash_lsh (no explode×perms shuffle); occupancy is one
    groupBy(band, sig) with map-side combine (bucket-domain-sized
    output), then a ≤4-row rollup. No self-join anywhere — this query
    costs the TABLE, not the candidate pairs.
    """
    sh = _shingle_sets(spark, sf_dir)
    bands = (
        sh.select("doc_id", minhash_array(F.col("sh"), MINHASH_PERMS).alias("mh"))
        .select(
            "doc_id",
            F.posexplode(
                band_sigs(F.col("mh"), MINHASH_PERMS, MINHASH_BANDS)
            ).alias("band", "sig"),
        )
        .filter(F.col("sig") != "")
    )
    occ = bands.groupBy("band", "sig").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        occ.groupBy(F.col("band").cast("long").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.count_if(F.col("c") == 1).cast("long").alias("n_singleton"),
            F.max("c").cast("long").alias("max_occupancy"),
            F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("candidate_pairs"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# orders_imr_control
# ---------------------------------------------------------------------------


@register(
    "orders_imr_control",
    oracle="""
        WITH monthly AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS m,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS x
            FROM orders GROUP BY 1
        ),
        mr AS (
            SELECT m, x,
                   abs(x - LAG(x) OVER (ORDER BY m)) AS mr
            FROM monthly
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(count(mr) AS BIGINT) AS nmr,
                   CAST(sum(mr) AS BIGINT) AS smr
            FROM mr
        )
        SELECT n AS n_months, sx // n AS mean_rev_c, smr // nmr AS mr_mean_c,
               CAST((SELECT count_if(100 * s.nmr * s.n * x
                                     > 100 * s.nmr * s.sx + 266 * s.n * s.smr)
                     FROM monthly) AS BIGINT) AS n_above_ucl,
               CAST((SELECT count_if(100 * s.nmr * s.n * x
                                     < 100 * s.nmr * s.sx - 266 * s.n * s.smr)
                     FROM monthly) AS BIGINT) AS n_below_lcl
        FROM s WHERE nmr > 0
    """,
    tags=("relational", "statistics", "spc"),
)
def orders_imr_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Individuals/moving-range (I-MR) control chart over monthly
    order revenue in exact cents: center line x̄, average moving range
    MR̄ = mean |x_i − x_{i−1}| over the month order, control limits
    x̄ ± 2.66·MR̄ (the standard d₂-derived constant for n=2 moving
    ranges), and the count of months outside each limit. The SPC
    answer to "is this month's revenue a signal or noise" — the
    control-chart sibling of the supplier x̄-R and p-chart entries,
    on the individual-values series a monthly rollup actually is.
    Violation checks cross-multiply to pure BIGINT comparisons
    (100·m·n·x vs 100·m·Σx ± 266·n·ΣMR — no division, no floats), so
    the out-of-control counts are bit-exact at any corpus size.

    Scale shape: the fact table aggregates to the calendar-bounded
    monthly relation before anything else; the lag window, the
    4-number moment rollup, and the violation scan all run on ≤ a few
    hundred rows.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("m")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    monthly = monthly.persist()  # moments + violation scan share it
    w = Window.orderBy("m")
    mr = monthly.select("m", "x", F.abs(F.col("x") - F.lag("x").over(w)).alias("mr"))
    s = mr.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.count("mr").cast("long").alias("nmr"),
        F.sum("mr").cast("long").alias("smr"),
    )
    joined = monthly.crossJoin(F.broadcast(s.filter(F.col("nmr") > 0)))
    lhs = 100 * F.col("nmr") * F.col("n") * F.col("x")
    center = 100 * F.col("nmr") * F.col("sx")
    spread = 266 * F.col("n") * F.col("smr")
    return joined.groupBy("n", "sx", "nmr", "smr").agg(
        F.count_if(lhs > center + spread).cast("long").alias("n_above_ucl"),
        F.count_if(lhs < center - spread).cast("long").alias("n_below_lcl"),
    ).select(
        F.col("n").alias("n_months"),
        F.expr("sx div n").alias("mean_rev_c"),
        F.expr("smr div nmr").alias("mr_mean_c"),
        "n_above_ucl",
        "n_below_lcl",
    )


# ---------------------------------------------------------------------------
# embedding_hubness_audit
# ---------------------------------------------------------------------------

_HUB_K = 3  # neighbor-list length per vector


@register(
    "embedding_hubness_audit",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        buckets AS (
            SELECT vec_id, v,
                   string_agg(CASE WHEN list_sum(list_transform(range(1, 65),
                        i -> {_SQL_PLANE_COMP} * v[CAST(i AS INT)])) >= 0
                        THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
            FROM e, (SELECT unnest(range({_N_PLANES})) AS p)
            GROUP BY vec_id, v
        ),
        scored AS (
            SELECT a.vec_id AS src, b.vec_id AS nbr,
                   list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))) AS c
            FROM buckets a JOIN buckets b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        ),
        chosen AS (
            SELECT src, nbr FROM (
                SELECT src, nbr,
                       ROW_NUMBER() OVER (PARTITION BY src
                                          ORDER BY c DESC, nbr) AS r
                FROM scored
            ) WHERE r <= {_HUB_K}
        ),
        indeg AS (
            SELECT e.vec_id,
                   CAST(COALESCE(k.d, 0) AS BIGINT) AS d
            FROM e LEFT JOIN (
                SELECT nbr, count(*) AS d FROM chosen GROUP BY nbr
            ) k ON k.nbr = e.vec_id
        )
        SELECT CAST(CASE WHEN d >= 5 THEN 5 ELSE d END AS BIGINT) AS indeg_band,
               CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(max(d) AS BIGINT) AS max_indegree
        FROM indeg GROUP BY 1 ORDER BY 1
    """,
    tags=("llm-data", "similarity", "audit"),
)
def embedding_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness profile of the bucketed candidate k-NN graph: each
    vector's top-3 (_HUB_K) same-bucket neighbors (cosine DESC, id
    tie-break — the dedup_embedding_cosine 8-plane sign buckets), then
    the reverse-occurrence (in-degree) histogram banded at 0..4/5+
    with the per-band max. Hub vectors — in-degree far above k — are
    the classic high-dimensional ANN pathology: they dominate k-NN
    votes (ml_knn_label_accuracy) and chain unrelated docs through
    semantic dedup. Antihubs (in-degree 0, including bucket
    singletons) measure how much of the corpus the candidate graph
    cannot reach — the same number the IVF nprobe-recall curve
    approaches from the probe side.

    Scale shape: candidate edges are bucket-blocked (≈ n²/256 pairs,
    both orientations), the per-source top-k is one window over the
    candidate relation partitioned by src, and the in-degree rollup
    is a vocabulary-sized groupBy joined back to the vector ids with
    a broadcast. No all-pairs anywhere.
    """
    e = widen(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # r13: per-row sign bucket (see _embed.hyperplane_bucket) — the
    # plane-table crossJoin + groupBy(vec_id, v) it replaces
    # exchanged an 8×-exploded copy of every vector.
    buckets = e.select(
        "vec_id", "v", hyperplane_bucket(_N_PLANES).alias("bucket")
    ).persist()  # both self-join sides share it
    a = buckets.alias("a")
    b = buckets.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(F.col(side), F.col(side), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("src"),
        F.col("b.vec_id").alias("nbr"),
        (dot / (norm("a.v") * norm("b.v"))).alias("c"),
    )
    wk = Window.partitionBy("src").orderBy(F.desc("c"), "nbr")
    chosen = (
        scored.withColumn("r", F.row_number().over(wk))
        .filter(F.col("r") <= _HUB_K)
        .select("src", "nbr")
    )
    indeg = (
        e.select("vec_id")
        .join(
            F.broadcast(chosen.groupBy("nbr").agg(F.count(F.lit(1)).alias("d"))),
            e.vec_id == F.col("nbr"),
            "left",
        )
        .select("vec_id", F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("d"))
    )
    return (
        indeg.groupBy(
            F.when(F.col("d") >= 5, 5).otherwise(F.col("d")).cast("long").alias(
                "indeg_band"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.max("d").cast("long").alias("max_indegree"),
        )
        .orderBy("indeg_band")
    )


# ---------------------------------------------------------------------------
# events_g_chart_intervals
# ---------------------------------------------------------------------------


@register(
    "events_g_chart_intervals",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        errs AS (
            SELECT user_id, rn,
                   rn - LAG(rn) OVER (PARTITION BY user_id ORDER BY rn) - 1
                       AS g
            FROM seq WHERE event_type = 'error'
        ),
        gaps AS (SELECT g FROM errs WHERE g IS NOT NULL),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(sum(g) AS BIGINT) AS sg
            FROM gaps
        ),
        banded AS (
            SELECT CASE WHEN g = 0 THEN 0
                        WHEN g <= 2 THEN 1
                        WHEN g <= 5 THEN 3
                        WHEN g <= 10 THEN 6
                        ELSE 11 END AS band_lo, g
            FROM gaps
        )
        SELECT CAST(band_lo AS BIGINT) AS band_lo,
               CAST(count(*) AS BIGINT) AS n_intervals,
               s.sg // s.n_gaps AS mean_gap,
               (10000 * count(*)) // s.n_gaps AS share4
        FROM banded CROSS JOIN s
        GROUP BY band_lo, s.sg, s.n_gaps ORDER BY band_lo
    """,
    tags=("events", "statistics", "spc"),
)
def events_g_chart_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g-chart statistics: events between consecutive errors per user
    stream ((ts, event_id) total order), banded — the rare-event SPC
    view. Where MTBF/MTTR measures TIME between failures, the g-chart
    counts OPPORTUNITIES between them (the geometric distribution
    under a constant error rate): a shrinking mean interval is
    degradation even when traffic, and therefore failure timestamps,
    accelerate. Gap lengths are exact integer row-number differences;
    bands and shares are pure integer arithmetic over the gap
    multiset, with the global mean as one integer division.

    Scale shape: one shuffle on user_id for the per-user sequence
    window, a second lag over the error subset reusing the same
    partitioning, then a ≤5-row band rollup with a broadcast total.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    we = Window.partitionBy("user_id").orderBy("rn")
    gaps = (
        seq.filter(F.col("event_type") == "error")
        .select(
            "user_id", (F.col("rn") - F.lag("rn").over(we) - 1).alias("g")
        )
        .filter(F.col("g").isNotNull())
        .select("g")
    )
    gaps = gaps.persist()  # totals + band rollup share it
    s = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("g").cast("long").alias("sg"),
    )
    banded = gaps.select(
        F.when(F.col("g") == 0, 0)
        .when(F.col("g") <= 2, 1)
        .when(F.col("g") <= 5, 3)
        .when(F.col("g") <= 10, 6)
        .otherwise(11)
        .cast("long")
        .alias("band_lo")
    )
    return (
        banded.groupBy("band_lo")
        .agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
        .crossJoin(F.broadcast(s))
        .select(
            "band_lo",
            "n_intervals",
            F.expr("sg div n_gaps").alias("mean_gap"),
            F.expr("(10000 * n_intervals) div n_gaps").alias("share4"),
        )
        .orderBy("band_lo")
    )
