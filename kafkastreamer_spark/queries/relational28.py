"""Round-9 batch 237: Murphy decomposition of the Brier score.

``ml_brier_decomposition`` splits the click-propensity model's Brier
score into reliability (calibration badness), resolution
(discrimination), and uncertainty (base-rate entropy) over the same
score bins and quantized rates as ``ml_calibration_bins`` — the model
card line that says WHY the Brier number is what it is: a model can
have a good Brier purely from a lopsided base rate (high UNC, zero
RES), and the decomposition is what exposes that.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B ML-metrics
closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.queries.relational16 import _PER_USER_SQL, _per_user
from kafkastreamer_spark.registry import register


@register(
    "ml_brier_decomposition",
    oracle=f"""
        WITH per_user AS ({_PER_USER_SQL}),
        b AS (
            SELECT least(score, 10) AS bin,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS pos
            FROM per_user GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(pos) AS BIGINT) AS pp
            FROM b
        ),
        q AS (
            SELECT b.bin, b.n, b.pos,
                   CAST(1000 * b.bin AS BIGINT) AS pred4,
                   (10000 * b.pos) // b.n AS obs4,
                   (10000 * t.pp) // t.nn AS base4,
                   t.nn, t.pp
            FROM b CROSS JOIN tot t
        )
        SELECT max(nn) AS n_users, max(pp) AS n_pos,
               CAST(max(base4) AS BIGINT) AS base_rate4,
               CAST(max(base4) * (10000 - max(base4)) AS BIGINT) AS unc8,
               CAST(sum(n * (pred4 - obs4) * (pred4 - obs4)) // max(nn)
                    AS BIGINT) AS rel8,
               CAST(sum(n * (obs4 - base4) * (obs4 - base4)) // max(nn)
                    AS BIGINT) AS res8,
               CAST(sum(n * (pred4 - obs4) * (pred4 - obs4)) // max(nn)
                    - sum(n * (obs4 - base4) * (obs4 - base4)) // max(nn)
                    + max(base4) * (10000 - max(base4)) AS BIGINT) AS brier8
        FROM q
    """,
    tags=("ml", "metrics", "calibration"),
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition Brier = REL - RES + UNC for the
    click-count propensity model (same per-user score/label and the
    same p = min(score,10)/10 bins as ml_calibration_bins /
    ml_click_purchase_auc):

      REL8 = (1/N) sum_k n_k (pred4_k - obs4_k)^2   (1e-8 fixed point)
      RES8 = (1/N) sum_k n_k (obs4_k - base4)^2
      UNC8 = base4 * (10^4 - base4)

    computed on the calibration table's OWN 1e-4-quantized per-bin
    observed rates and base rate — the decomposition of the numbers
    the card actually prints, every term exact BIGINT arithmetic with
    one floor division per term (quantization displaces each term
    from the real-valued decomposition by < 1e-3 absolute; stated, and
    identical on both engines by construction). High UNC with RES ~ 0
    says the score carries no information beyond the base rate; high
    REL says the bins lie — the two failure modes a bare Brier number
    hides.

    Scale shape: one groupBy(user_id) over the fact table (the ML
    family's single fact shuffle), an 11-bin rollup, a broadcast
    1-row total, and a 1-row report. Squared terms peak at
    n_k * (10^4)^2 <= N * 10^8 — BIGINT headroom to N ~ 10^10 users.
    """
    pu = _per_user(spark, sf_dir)
    b = pu.groupBy(F.least("score", F.lit(10)).alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    tot = b.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("pos").cast("long").alias("pp"),
    )
    q = b.crossJoin(F.broadcast(tot)).select(
        "n",
        "pos",
        "nn",
        "pp",
        (F.lit(1000) * F.col("bin")).cast("long").alias("pred4"),
        F.expr("(10000 * pos) div n").cast("long").alias("obs4"),
        F.expr("(10000 * pp) div nn").cast("long").alias("base4"),
    )
    return q.agg(
        F.max("nn").alias("n_users"),
        F.max("pp").alias("n_pos"),
        F.max("base4").cast("long").alias("base_rate4"),
        (F.max("base4") * (F.lit(10000) - F.max("base4")))
        .cast("long")
        .alias("unc8"),
        F.expr("sum(n * (pred4 - obs4) * (pred4 - obs4)) div max(nn)")
        .cast("long")
        .alias("rel8"),
        F.expr("sum(n * (obs4 - base4) * (obs4 - base4)) div max(nn)")
        .cast("long")
        .alias("res8"),
        (
            F.expr("sum(n * (pred4 - obs4) * (pred4 - obs4)) div max(nn)")
            - F.expr("sum(n * (obs4 - base4) * (obs4 - base4)) div max(nn)")
            + F.max("base4") * (F.lit(10000) - F.max("base4"))
        )
        .cast("long")
        .alias("brier8"),
    )
