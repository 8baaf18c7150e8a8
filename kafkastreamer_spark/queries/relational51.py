"""Round-13 batch 260: forward as-of join, cluster quality per label,
and the repeat-purchase curve.

* ``join_asof_next_error`` — the FORWARD as-of join (first error
  strictly after each purchase, per user): the time-to-failure
  direction join_asof_prev_purchase doesn't cover, with the same
  union-and-sweep single-shuffle formulation checked against the
  naive inequality-join oracle.
* ``embedding_silhouette_simplified`` — simplified (centroid-based)
  silhouette per label over the embedding table: the cluster-quality
  score that says whether labels are geometrically separable —
  the evaluation bridge between embedding_label_centroids (the
  geometry) and ml_nearest_centroid_f1 (the classifier built on it).
* ``customer_repeat_order_curve`` — share of customers reaching ≥ k
  orders for k = 1..10: the repeat-purchase retention curve beside
  RFM (a snapshot) and cohort LTV (revenue over time).

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B join /
ML-evaluation / relational closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.queries._util import epoch_us
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# join_asof_next_error
# ---------------------------------------------------------------------------


@register(
    "join_asof_next_error",
    oracle="""
        WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        e AS (SELECT * FROM events WHERE event_type = 'error'),
        m AS (
            SELECT p.event_id AS purchase_id, e.event_id AS e_id,
                   e.ts AS e_ts,
                   ROW_NUMBER() OVER (PARTITION BY p.event_id
                                      ORDER BY e.ts, e.event_id) AS rn
            FROM p JOIN e ON e.user_id = p.user_id AND e.ts > p.ts
        )
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
               m.e_id AS next_error_id,
               epoch_us(m.e_ts) - epoch_us(p.ts) AS micros_to_error
        FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
          ON m.purchase_id = p.event_id
        ORDER BY p.event_id
    """,
    tags=("join", "asof", "temporal"),
)
def join_asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for every purchase, the FIRST error by the
    same user strictly after it (earliest ts, lowest event_id on
    ties; purchases with no later error keep nulls) — the
    time-to-next-failure direction, where join_asof_prev_purchase
    looks backward. Same scalable union-and-sweep form, mirrored:
    tag both sides, union, sort each user's timeline once, and pull
    the next error back with ``first(..., ignorenulls=True)`` over
    rows-current-to-unbounded-following. STRICTNESS lives in the side
    ordering: errors sort BEFORE purchases at equal ts, so a
    same-instant error is outside the purchase's following frame —
    exactly e.ts > p.ts. One hash shuffle on user_id, no candidate
    blowup; the oracle deliberately uses the naive inequality join +
    ROW_NUMBER so two independent strategies check each other.

    Scale shape: identical to the backward sweep — both event_type
    filters push to the scan, one exchange on the key, O(n log n)
    per user timeline.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("side"),  # before purchases at equal ts
        F.col("event_id").alias("e_id"),
        F.col("ts").alias("e_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("e_id"),
        F.lit(None).cast("timestamp").alias("e_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    swept = errors.unionByName(purchases).select(
        "user_id",
        "ts",
        "event_id",
        "side",
        F.first("e_id", ignorenulls=True).over(w).alias("next_error_id"),
        F.first("e_ts", ignorenulls=True).over(w).alias("next_ts"),
    )
    return (
        swept.filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "purchase_ts"
            ),
            "next_error_id",
            (epoch_us("next_ts") - epoch_us("ts")).alias("micros_to_error"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# embedding_silhouette_simplified
# ---------------------------------------------------------------------------

_SIL_FP = 1000000  # centroid fixed point (matches embedding_label_centroids)


@register(
    "embedding_silhouette_simplified",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        ),
        dims AS (
            SELECT label, dim, v[dim] AS x
            FROM e, unnest(range(1, len(v) + 1)) AS t(dim)
        ),
        cent AS (
            SELECT label, dim,
                   CAST(SUM(CAST(FLOOR(x * {_SIL_FP}) AS BIGINT)) AS DOUBLE)
                       / ({_SIL_FP} * count(*)) AS c
            FROM dims GROUP BY label, dim
        ),
        carr AS (
            SELECT label, array_agg(c ORDER BY dim) AS cv FROM cent
            GROUP BY label
        ),
        dist AS (
            SELECT e.vec_id, e.label AS own, carr.label AS other,
                   sqrt(list_sum(list_transform(range(1, len(e.v) + 1),
                        i -> (e.v[CAST(i AS INT)] - carr.cv[CAST(i AS INT)])
                           * (e.v[CAST(i AS INT)] - carr.cv[CAST(i AS INT)]))))
                       AS d
            FROM e CROSS JOIN carr
        ),
        ab AS (
            SELECT vec_id, own,
                   max(CASE WHEN own = other THEN d END) AS a,
                   min(CASE WHEN own <> other THEN d END) AS b
            FROM dist GROUP BY vec_id, own
        ),
        s AS (
            SELECT own AS label,
                   CAST(floor(10000.0 * (b - a) / greatest(a, b)) AS BIGINT)
                       AS s4
            FROM ab WHERE greatest(a, b) > 0
        )
        SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(sum(s4) AS BIGINT) // count(*) AS mean_s4,
               CAST(min(s4) AS BIGINT) AS min_s4
        FROM s GROUP BY label ORDER BY label
    """,
    tags=("llm-data", "similarity", "evaluation"),
)
def embedding_silhouette_simplified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simplified (centroid-based) silhouette per label: for each
    vector, a = distance to its own label centroid, b = distance to
    the nearest OTHER label centroid, s = (b − a)/max(a, b) — the
    standard O(n·k) silhouette variant (the full pairwise form is
    O(n²)). Mean and min s per label say whether labels are
    geometrically coherent (s → 1), overlapping (s → 0), or
    mis-assigned (s < 0) — the unsupervised quality gate between the
    centroid geometry and the nearest-centroid classifier's F1.
    Centroids use the exact fp6 integer-sum construction of
    embedding_label_centroids; distances fold over dims in index
    order on both engines, so a, b, and every fp4-floored s agree
    bit-for-bit; per-vector floors make the label mean an exact
    integer division.

    Scale shape: one (label × dim) aggregation with map-side combine
    builds the centroids (bounded |labels|·64 rows → arrays →
    broadcast); vectors stream once against the broadcast centroid
    set (n·k distance rows, k = |labels|); everything downstream is
    per-label scalar work.
    """
    e = widen(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    dims = e.select("label", F.posexplode("v").alias("pos", "x")).select(
        "label", (F.col("pos") + 1).alias("dim"), "x"
    )
    cent = dims.groupBy("label", "dim").agg(
        (
            F.sum(F.floor(F.col("x") * _SIL_FP).cast("long")).cast("double")
            / (_SIL_FP * F.count(F.lit(1)))
        ).alias("c")
    )
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda x: x["c"]
        ).alias("cv")
    )
    joined = e.crossJoin(
        F.broadcast(carr.select(F.col("label").alias("other"), "cv"))
    )
    d = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    dist = joined.select(
        "vec_id", F.col("label").alias("own"), "other", d.alias("d")
    )
    ab = dist.groupBy("vec_id", "own").agg(
        F.max(F.when(F.col("own") == F.col("other"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("own") != F.col("other"), F.col("d"))).alias("b"),
    )
    s4 = F.floor(
        10000.0
        * (F.col("b") - F.col("a"))
        / F.greatest(F.col("a"), F.col("b"))
    ).cast("long")
    s = ab.filter(F.greatest(F.col("a"), F.col("b")) > 0).select(
        F.col("own").alias("label"), s4.alias("s4")
    )
    return (
        s.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.expr("CAST(sum(s4) AS BIGINT) div count(*)").alias("mean_s4"),
            F.min("s4").cast("long").alias("min_s4"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# customer_repeat_order_curve
# ---------------------------------------------------------------------------

_REPEAT_MAX_K = 10


@register(
    "customer_repeat_order_curve",
    oracle=f"""
        WITH per_cust AS (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY o_custkey
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_customers FROM per_cust),
        ladder AS (SELECT unnest(range(1, {_REPEAT_MAX_K} + 1)) AS k)
        SELECT CAST(l.k AS BIGINT) AS k,
               CAST(count_if(p.n_orders >= l.k) AS BIGINT) AS n_reached,
               (10000 * count_if(p.n_orders >= l.k)) // tot.n_customers
                   AS share4
        FROM ladder l CROSS JOIN per_cust p CROSS JOIN tot
        GROUP BY l.k, tot.n_customers ORDER BY k
    """,
    tags=("relational", "retention", "curve"),
)
def customer_repeat_order_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase curve: the share of ordering customers who
    reach at least k orders, for k = 1..10 — the decaying curve whose
    slope IS the repeat-purchase economics (k=1 → 2 retention is the
    number retail lives or dies by). A pure counting complement to
    RFM segmentation (a snapshot) and cohort LTV (revenue-weighted):
    this one is unit-free and exactly integer end to end.

    Scale shape: one groupBy(custkey) fact pass, then the 10-row
    ladder joins the bounded per-customer-count relation with the
    conditional count collapsing map-side; ≤10 output rows.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    per_cust = per_cust.persist()  # total + ladder join share it
    tot = per_cust.agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    ladder = spark.range(1, _REPEAT_MAX_K + 1).select(F.col("id").alias("k"))
    return (
        F.broadcast(ladder)
        .crossJoin(per_cust)
        .groupBy("k")
        .agg(
            F.count_if(F.col("n_orders") >= F.col("k"))
            .cast("long")
            .alias("n_reached")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("k"),
            "n_reached",
            F.expr("(10000 * n_reached) div n_customers").alias("share4"),
        )
        .orderBy("k")
    )
