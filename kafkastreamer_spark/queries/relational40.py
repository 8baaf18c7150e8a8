"""Round-12 batch 249: CUPED variance-reduced uplift, linear
calibration recalibration, session-duration profiling, and SimHash
bit-balance diagnostics.

* ``events_cuped_adjusted_uplift`` — the A/B uplift of post-period
  spend with CUPED pre-period adjustment (theta = Sxy/Sxx on the
  pooled pre-activity covariate), next to ml_ab_srm_and_uplift's raw
  readout: the variance-reduction step every mature experimentation
  stack applies before reading an effect.
* ``ml_calibration_slope_intercept`` — weighted least-squares
  calibration line (observed rate on predicted probability) over the
  ml_calibration_bins bins: slope < 1 reads as overconfidence,
  intercept > 0 as global underprediction — the two-number
  recalibration summary next to ECE and the Brier decomposition.
* ``events_session_duration_histogram`` — 30-min-gap session
  durations rolled into fixed bands (single-event through >30 min)
  with shares — the engagement-length profile on the same session
  definition as events_sessionization.
* ``dedup_simhash_bit_balance`` — per-bit set-rate of the 128-bit
  SimHash signature population rolled into bias bands: balanced bits
  (~50% set) maximize hamming discrimination; a skewed band profile
  is the fingerprint of a degenerate token vocabulary (this fixture's
  ~31-token documents table shows exactly that — the audit measures
  the degeneracy the near-dup family designs around).

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B
experimentation / ML-evaluation / LLM-dedup diagnostics closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import SQL_TOKENS, tokens
from kafkastreamer_spark.queries.relational16 import _PER_USER_SQL
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# events_cuped_adjusted_uplift
# ---------------------------------------------------------------------------

_PRE_DAYS = 15


@register(
    "events_cuped_adjusted_uplift",
    oracle=f"""
        WITH anchor AS (SELECT min(ts) AS t0 FROM events),
        per_user AS (
            SELECT e.user_id,
                   CAST(('0x' || substr(md5('ab_' || CAST(e.user_id AS VARCHAR)),
                        1, 8)) AS BIGINT) % 2 AS arm,
                   CAST(count_if(e.ts < anchor.t0
                        + to_days({_PRE_DAYS})) AS BIGINT) AS x,
                   CAST(COALESCE(sum(CASE WHEN e.ts >= anchor.t0
                        + to_days({_PRE_DAYS})
                        THEN CAST(FLOOR(e.value) AS BIGINT) ELSE 0 END), 0)
                        AS BIGINT) AS y
            FROM events e CROSS JOIN anchor
            GROUP BY 1, 2
        ),
        pooled AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM per_user
        ),
        arms AS (
            SELECT CAST(count_if(arm = 0) AS BIGINT) AS na,
                   CAST(count_if(arm = 1) AS BIGINT) AS nb,
                   CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS ya,
                   CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS yb,
                   CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS xa,
                   CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS xb
            FROM per_user
        ),
        calc AS (
            SELECT na, nb,
                   (10000 * ya) // na - (10000 * yb) // nb AS raw_uplift4,
                   (10000 * xa) // na - (10000 * xb) // nb AS x_gap4,
                   CASE WHEN pooled.n * pooled.sxx - pooled.sx * pooled.sx = 0
                        THEN CAST(0 AS BIGINT)
                        ELSE (10000 * (pooled.n * pooled.sxy
                                       - pooled.sx * pooled.sy))
                             // (pooled.n * pooled.sxx
                                 - pooled.sx * pooled.sx)
                   END AS theta4
            FROM arms CROSS JOIN pooled
        )
        SELECT na, nb, raw_uplift4, x_gap4, theta4,
               raw_uplift4 - (theta4 * x_gap4) // 10000 AS cuped_uplift4
        FROM calc
    """,
    tags=("ml", "experimentation", "cuped", "statistics"),
)
def events_cuped_adjusted_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B uplift: pre-period activity (event count in
    the first _PRE_DAYS=15 days, anchored at the corpus min timestamp)
    is the covariate X; post-period spend (whole currency units of
    ``value``) the outcome Y; theta = pooled Sxy/Sxx; adjusted uplift
    = raw − theta·(mean_a(X) − mean_b(X)). Because arms come from the
    same salted-md5 split as ml_ab_srm_and_uplift (independent of
    behavior by construction), the entry doubles as a null
    calibration: the adjustment should shrink the |raw| gap toward
    zero exactly when the arms' pre-period luck explains it —
    variance reduction in one readable row.

    Exactness & overflow: Y in whole units and X in small counts keep
    every cross-product inside BIGINT through sf10; theta is one
    guarded floor at fp4; the adjustment is a second documented
    floor.

    Scale shape: one groupBy(user_id) conditional pass against a
    broadcast 1-row anchor, two global aggregates, 1-row output.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    anchor = ev.agg(F.min("ts").alias("t0"))
    pre_edge = F.expr(f"t0 + make_interval(0, 0, 0, {_PRE_DAYS})")
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy(
            "user_id",
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
        )
        .agg(
            F.count_if(F.col("ts") < pre_edge).cast("long").alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("ts") >= pre_edge,
                        F.floor(F.col("value")).cast("long"),
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("y"),
        )
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    arms = per_user.agg(
        F.count_if(F.col("arm") == 0).cast("long").alias("na"),
        F.count_if(F.col("arm") == 1).cast("long").alias("nb"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("ya"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("yb"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0))
        .cast("long")
        .alias("xa"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0))
        .cast("long")
        .alias("xb"),
    )
    calc = arms.crossJoin(F.broadcast(pooled)).select(
        "na",
        "nb",
        F.expr("(10000 * ya) div na - (10000 * yb) div nb").alias("raw_uplift4"),
        F.expr("(10000 * xa) div na - (10000 * xb) div nb").alias("x_gap4"),
        F.when(F.expr("n * sxx - sx * sx") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr("(10000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)").cast(
                "long"
            )
        )
        .alias("theta4"),
    )
    return calc.select(
        "na",
        "nb",
        "raw_uplift4",
        "x_gap4",
        "theta4",
        F.expr("raw_uplift4 - (theta4 * x_gap4) div 10000").alias(
            "cuped_uplift4"
        ),
    )


# ---------------------------------------------------------------------------
# ml_calibration_slope_intercept
# ---------------------------------------------------------------------------


@register(
    "ml_calibration_slope_intercept",
    oracle=f"""
        WITH per_user AS ({_PER_USER_SQL}),
        b AS (
            SELECT least(score, 10) AS bin,
                   CAST(count(*) AS BIGINT) AS w,
                   CAST(sum(y) AS BIGINT) AS pos
            FROM per_user GROUP BY 1
        ),
        pts AS (
            -- fp3 coordinates keep every OLS cross-product inside
            -- BIGINT through sf10
            SELECT w, CAST(100 * bin AS BIGINT) AS x3,
                   (1000 * pos) // w AS y3
            FROM b
        ),
        s AS (
            SELECT CAST(sum(w) AS BIGINT) AS sw,
                   CAST(sum(w * x3) AS BIGINT) AS swx,
                   CAST(sum(w * y3) AS BIGINT) AS swy,
                   CAST(sum(w * x3 * x3) AS BIGINT) AS swxx,
                   CAST(sum(w * x3 * y3) AS BIGINT) AS swxy
            FROM pts
        )
        SELECT sw AS n_users,
               CASE WHEN sw * swxx - swx * swx = 0 THEN CAST(0 AS BIGINT)
                    ELSE (10000 * (sw * swxy - swx * swy))
                         // (sw * swxx - swx * swx)
               END AS slope4,
               (10 * swy) // sw
                   - (CASE WHEN sw * swxx - swx * swx = 0
                           THEN CAST(0 AS BIGINT)
                           ELSE (10000 * (sw * swxy - swx * swy))
                                // (sw * swxx - swx * swx)
                      END * ((10 * swx) // sw)) // 10000 AS intercept4
        FROM s
    """,
    tags=("ml", "evaluation", "calibration"),
)
def ml_calibration_slope_intercept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted least-squares calibration line for the shared
    click-propensity model: regress each calibration bin's observed
    positive rate on its predicted probability, weighted by bin
    population (the ml_calibration_bins bins, p = min(score,10)/10).
    slope4 < 10⁴ reads as overconfidence (observed moves less than
    predicted), intercept4 > 0 as global underprediction — the
    two-number recalibration summary a model card quotes next to ECE
    (which localizes the gap) and the Brier decomposition (which
    prices it).

    Exactness: fp3 coordinates (bin·100, floored rate·1000) bound
    every weighted cross-product inside BIGINT through sf10; slope
    and intercept are guarded floor divisions (intercept reuses the
    floored slope — one documented nested floor).

    Scale shape: one groupBy(user_id) fact pass, an 11-bin rollup,
    a 5-number aggregate, 1-row output.
    """
    from kafkastreamer_spark.queries.relational16 import _per_user

    b = _per_user(spark, sf_dir).groupBy(
        F.least("score", F.lit(10)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("w"),
        F.sum("y").cast("long").alias("pos"),
    )
    pts = b.select(
        "w",
        (F.lit(100) * F.col("bin")).cast("long").alias("x3"),
        F.expr("(1000 * pos) div w").alias("y3"),
    )
    s = pts.agg(
        F.sum("w").cast("long").alias("sw"),
        F.sum(F.col("w") * F.col("x3")).cast("long").alias("swx"),
        F.sum(F.col("w") * F.col("y3")).cast("long").alias("swy"),
        F.sum(F.col("w") * F.col("x3") * F.col("x3")).cast("long").alias("swxx"),
        F.sum(F.col("w") * F.col("x3") * F.col("y3")).cast("long").alias("swxy"),
    )
    slope = (
        "CASE WHEN sw * swxx - swx * swx = 0 THEN CAST(0 AS BIGINT)"
        " ELSE (10000 * (sw * swxy - swx * swy))"
        " div (sw * swxx - swx * swx) END"
    )
    return s.select(
        F.col("sw").alias("n_users"),
        F.expr(slope).cast("long").alias("slope4"),
        F.expr(
            f"(10 * swy) div sw - (({slope}) * ((10 * swx) div sw)) div 10000"
        )
        .cast("long")
        .alias("intercept4"),
    )


# ---------------------------------------------------------------------------
# events_session_duration_histogram
# ---------------------------------------------------------------------------

# band key = lower bound in SECONDS; durations compared in exact
# integer MICROSECONDS (fixture timestamps carry sub-second parts and
# DuckDB's epoch() is DOUBLE — epoch_us is the exact idiom)
_DUR_CASE = """
    CASE WHEN dur_us = 0 THEN 0
         WHEN dur_us <= 60000000 THEN 1
         WHEN dur_us <= 300000000 THEN 61
         WHEN dur_us <= 1800000000 THEN 301
         ELSE 1801 END
"""


@register(
    "events_session_duration_histogram",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                             OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                       AS session_id
            FROM flagged
        ),
        durs AS (
            SELECT epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
            FROM sessions GROUP BY user_id, session_id
        ),
        banded AS (SELECT {_DUR_CASE} AS band_lo_s FROM durs),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM banded)
        SELECT CAST(band_lo_s AS BIGINT) AS band_lo_s,
               CAST(count(*) AS BIGINT) AS n_sessions,
               (10000 * count(*)) // tot.n AS share4
        FROM banded CROSS JOIN tot
        GROUP BY band_lo_s, tot.n ORDER BY band_lo_s
    """,
    tags=("events", "session", "histogram"),
)
def events_session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration profile on the engine's standard 30-min-gap
    sessions (same gap rule and (ts, event_id) total order as
    events_sessionization): first-to-last-event span per session,
    rolled into fixed bands — instant (single event), ≤1 min, ≤5 min,
    ≤30 min, longer (gap-chained) — with shares. The
    engagement-length histogram that sits beside the sessionization
    table (which lists sessions) and the funnel latency quantiles
    (which time conversions).

    Scale shape: one shuffle on user_id reused by both window passes,
    a per-session min/max aggregate, a ≤5-row band rollup with a
    broadcast total.
    """
    from kafkastreamer_spark.queries._util import epoch_us

    ev = widen(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact microsecond gap (same idiom as events_session_path_topk in
    # relational37) — the oracle's `ts - LAG(ts) > INTERVAL 30 MINUTE`
    # is exact interval arithmetic, so a second-truncated epoch_s gap
    # could split sessions differently for true gaps in (1800, 1801)s
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    durs = sessions.groupBy("user_id", "session_id").agg(
        (epoch_us(F.max("ts")) - epoch_us(F.min("ts"))).alias("dur_us")
    )
    banded = durs.select(F.expr(_DUR_CASE).alias("band_lo_s"))
    tot = banded.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        banded.groupBy("band_lo_s")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("band_lo_s").cast("long"),
            "n_sessions",
            F.expr("(10000 * n_sessions) div n").alias("share4"),
        )
        .orderBy("band_lo_s")
    )


# ---------------------------------------------------------------------------
# dedup_simhash_bit_balance
# ---------------------------------------------------------------------------

_SH_BITS = 128
# deviation-from-balance bands in fp4 (|share4 - 5000|)
_BIAS_CASE = """
    CASE WHEN dev4 <= 250 THEN 0 WHEN dev4 <= 500 THEN 251
         WHEN dev4 <= 1000 THEN 501 WHEN dev4 <= 2500 THEN 1001
         ELSE 2501 END
"""


@register(
    "dedup_simhash_bit_balance",
    oracle=f"""
        WITH words AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
        toks AS (SELECT doc_id, unnest(list_distinct(w)) AS t FROM words),
        tok_bits AS (
            SELECT doc_id, b,
                   2 * (((instr('0123456789abcdef', substr(h, 1 + b // 4, 1))
                          - 1) // CAST(pow(2, 3 - b % 4) AS INT)) % 2) - 1
                       AS wgt
            FROM (SELECT doc_id, md5(t) AS h FROM toks),
                 (SELECT unnest(range({_SH_BITS})) AS b)
        ),
        bitsum AS (
            SELECT doc_id, b, SUM(wgt) AS s FROM tok_bits GROUP BY doc_id, b
        ),
        per_bit AS (
            SELECT b, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count_if(s >= 0) AS BIGINT) AS n_set
            FROM bitsum GROUP BY b
        ),
        devs AS (
            SELECT b, abs((10000 * n_set) // n_docs - 5000) AS dev4
            FROM per_bit
        ),
        banded AS (SELECT {_BIAS_CASE} AS band_lo4, dev4 FROM devs)
        SELECT CAST(band_lo4 AS BIGINT) AS band_lo4,
               CAST(count(*) AS BIGINT) AS n_bits,
               CAST(max(dev4) AS BIGINT) AS max_dev4
        FROM banded GROUP BY band_lo4 ORDER BY band_lo4
    """,
    tags=("llm-data", "dedup", "simhash", "audit"),
)
def dedup_simhash_bit_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signature health: per-bit set-rate over the document
    population (128-bit (_SH_BITS) signatures, same md5-derived token
    bits and s >= 0 sign rule as dedup_simhash), rolled into
    deviation-from-50% bands. Balanced bits carry one bit of
    discrimination each; a population of heavily biased bits means
    hamming distances compress and the block-LSH's candidate
    precision decays. On THIS fixture the audit deliberately exposes
    the documented ~31-distinct-token vocabulary degeneracy
    (FIXTURES.md): most bits are strongly biased because every
    signature draws from the same few token hashes — the audit is the
    instrument that would catch such corpus pathology in production
    before the dedup quality regressed silently.

    Scale shape: per-doc bit sums fold map-side over the token-hash
    array (one md5 per distinct token, no row explosion in Spark —
    the 128-wide (_SH_BITS) accumulator is an F.aggregate over
    materialized digests); the only shuffled relation is (doc × bit)
    partial sums aggregating to 128 (_SH_BITS) rows, banded to ≤5.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.array_distinct(tokens("text")).alias("ws")
    ).select("doc_id", F.transform("ws", lambda t: F.md5(t)).alias("hs"))
    bit_seq = F.sequence(F.lit(0), F.lit(_SH_BITS - 1))
    # per-doc signed bit sums: fold token digests into a 128-wide
    # accumulator (digest materialized first; the bit extraction is
    # string/arithmetic ops per element, no re-hashing per bit)
    sums = toks.select(
        "doc_id",
        F.aggregate(
            F.col("hs"),
            F.array_repeat(F.lit(0).cast("long"), _SH_BITS),
            lambda acc, h: F.zip_with(
                acc,
                bit_seq,
                lambda a, b: a
                + 2
                * (
                    (
                        (
                            F.instr(
                                F.lit("0123456789abcdef"),
                                F.substring(h, (1 + (b / 4).cast("int")).cast("int"), 1),
                            )
                            - 1
                        )
                        / F.pow(F.lit(2.0), (3 - b % 4).cast("double")).cast("int")
                    ).cast("int")
                    % 2
                )
                - 1,
            ),
        ).alias("bits"),
    ).filter(F.size("hs") > 0)
    per_bit = (
        sums.select(F.posexplode("bits").alias("b", "s"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_if(F.col("s") >= 0).cast("long").alias("n_set"),
        )
    )
    devs = per_bit.select(
        F.abs(F.expr("(10000 * n_set) div n_docs - 5000")).alias("dev4")
    )
    return (
        devs.select(F.expr(_BIAS_CASE).alias("band_lo4"), "dev4")
        .groupBy("band_lo4")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bits"),
            F.max("dev4").cast("long").alias("max_dev4"),
        )
        .select(F.col("band_lo4").cast("long"), "n_bits", "max_dev4")
        .orderBy("band_lo4")
    )
