"""Round-10 batch 240: SRE burn-rate alerting and week-over-week
heavy changers.

* ``events_burn_rate_alerts`` — the multiwindow, multi-burn-rate
  alert table from the Google SRE workbook: a page fires when BOTH a
  long and a short window burn the error budget at >= 14.4x, a
  ticket at >= 6x — the short window making alerts reset fast, the
  long window making them noise-proof. Completes the reliability
  family next to events_error_budget_sli (which reports the budget,
  not the alert decision).
* ``events_heavy_changers_wow`` — top individual movers by absolute
  week-over-week activity delta: names WHO changed, complementing
  events_growth_accounting (which counts new/retained/churned users
  without naming them) and events_topk_churn (which tracks top-set
  stability).

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B ops
analytics closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# (rule, long window, short window, burn threshold x100) — the SRE
# workbook's 1%-budget multiwindow ladder, hour-scaled to the fixture
_BURN_RULES = (
    ("page", 3600, 300, 1440),
    ("ticket", 21600, 1800, 600),
)
_BURN_WINDOWS = sorted({w for r in _BURN_RULES for w in (r[1], r[2])})


@register(
    "events_burn_rate_alerts",
    oracle=f"""
        WITH mx AS (SELECT max(ts) AS mt FROM events),
        w AS (
            SELECT win.w_s,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count_if(e.event_type = 'error') AS BIGINT)
                       AS n_errors
            FROM events e
            CROSS JOIN (SELECT unnest([{", ".join(str(w) for w in _BURN_WINDOWS)}])
                            AS w_s) win
            CROSS JOIN mx
            WHERE epoch_us(mx.mt) - epoch_us(e.ts)
                  < CAST(win.w_s AS BIGINT) * 1000000
            GROUP BY win.w_s
        ),
        b AS (
            SELECT w_s, n_events, n_errors,
                   (n_errors * 1000000) // n_events AS burn4
            FROM w
        )
        SELECT r.rule, r.long_s, r.short_s,
               bl.burn4 AS long_burn4, bs.burn4 AS short_burn4,
               CAST(CASE WHEN bl.burn4 >= r.thr4 AND bs.burn4 >= r.thr4
                         THEN 1 ELSE 0 END AS BIGINT) AS fired
        FROM (VALUES {", ".join(f"('{r[0]}', {r[1]}, {r[2]}, CAST({r[3]} * 100 AS BIGINT))" for r in _BURN_RULES)})
             AS r(rule, long_s, short_s, thr4)
        LEFT JOIN b bl ON bl.w_s = r.long_s
        LEFT JOIN b bs ON bs.w_s = r.short_s
        ORDER BY rule
    """,
    tags=("events", "sre", "ops", "alerting"),
)
def events_burn_rate_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow multi-burn-rate alert evaluation (SRE workbook
    chapter 5, scaled to the fixture's clock): with a 1% error
    budget, burn rate = error_rate / 1%, and a rule fires only when
    BOTH its long window (noise-proofing) and its short window (fast
    reset) exceed the threshold — page at 14.4x over (1h, 5m), ticket
    at 6x over (6h, 30m), windows anchored at the stream's max
    timestamp. Fixed-point integers throughout (burn4 = burn * 1e4 =
    errors * 1e6 div events), so the oracle is exact.

    Scale shape: ONE pass over events computes every window's
    (events, errors) pair via conditional aggregation against the
    broadcast max-timestamp scalar — no per-window re-scan; the rule
    table is a literal join over the 4-row window aggregate.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    mx = ev.agg(F.max("ts").alias("mt"))
    agg_cols = []
    for w_s in _BURN_WINDOWS:
        in_w = F.unix_micros(F.col("mt")) - F.unix_micros(F.col("ts")) < (
            F.lit(w_s).cast("long") * 1_000_000
        )
        agg_cols.append(
            F.sum(F.when(in_w, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{w_s}")
        )
        agg_cols.append(
            F.sum(
                F.when(in_w & (F.col("event_type") == "error"), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"e_{w_s}")
        )
    one = ev.crossJoin(F.broadcast(mx)).agg(*agg_cols)
    return _burn_rule_table(spark, one)


def _burn_rule_table(spark: SparkSession, one: DataFrame) -> DataFrame:
    """Evaluate every _BURN_RULES row against a 1-row DataFrame with
    (n_{w}, e_{w}) columns per window — the shared tail of the
    max-ts-anchored alert query, the bucket-aligned hopping variant,
    and the streaming twin's foreachBatch evaluation."""
    rules = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3] * 100) for r in _BURN_RULES],
        "rule string, long_s int, short_s int, thr4 long",
    )
    burn = lambda w: f"(e_{w} * 1000000) div n_{w}"  # noqa: E731
    rows = rules.crossJoin(F.broadcast(one))
    long_burn = F.coalesce(
        *[
            F.when(F.col("long_s") == w, F.expr(burn(w)))
            for w in _BURN_WINDOWS
        ]
    ).cast("long")
    short_burn = F.coalesce(
        *[
            F.when(F.col("short_s") == w, F.expr(burn(w)))
            for w in _BURN_WINDOWS
        ]
    ).cast("long")
    return (
        rows.withColumn("long_burn4", long_burn)
        .withColumn("short_burn4", short_burn)
        .select(
            "rule",
            "long_s",
            "short_s",
            "long_burn4",
            "short_burn4",
            # when(...)/otherwise(0) (not a bare boolean cast) so an
            # empty window's NULL burn yields fired=0 exactly like the
            # oracle's CASE — NULL-burn rows must agree cross-engine
            F.when(
                (F.col("long_burn4") >= F.col("thr4"))
                & (F.col("short_burn4") >= F.col("thr4")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("fired"),
        )
        .orderBy("rule")
    )


# ---------------------------------------------------------------------------
# events_burn_rate_hopping (+ the bucket helpers shared with the
# streaming twin, streaming/burn_rate.py)
# ---------------------------------------------------------------------------

# Bucket granularity: gcd of every window in _BURN_RULES (300, 1800,
# 3600, 21600 are all multiples of 300), so each window is an exact
# whole number of buckets.
_BURN_BUCKET_S = 300


def bucket_error_counts(ev: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Per-5-minute-bucket (bucket, n, e) counts — the distributed
    volume-carrying stage of the hopping burn-rate evaluation, and
    the exact output contract of the streaming twin's stateful stage
    (streaming.burn_rate.streaming_bucket_error_counts emits the
    same rows cumulatively in update mode)."""
    return ev.groupBy(
        F.expr(f"unix_micros({ts_col}) div {_BURN_BUCKET_S * 1_000_000}").alias(
            "bucket"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("e"),
    )


def burn_alerts_from_buckets(spark: SparkSession, buckets: DataFrame) -> DataFrame:
    """Evaluate the _BURN_RULES alert table over a (bucket, n, e)
    count table, windows anchored at the close of the latest bucket —
    the shared tail of events_burn_rate_hopping and the streaming
    twin's foreachBatch evaluation. The bucket table is bounded
    (one row per 5-minute bucket in the horizon), so the cross join
    against the broadcast max-bucket scalar and the conditional sums
    are all tiny."""
    mb = buckets.agg(F.max("bucket").alias("mb"))
    b = buckets.crossJoin(F.broadcast(mb))
    aggs = []
    for w_s in _BURN_WINDOWS:
        k = w_s // _BURN_BUCKET_S
        in_w = F.col("bucket") > F.col("mb") - k
        aggs.append(
            F.sum(F.when(in_w, F.col("n")).otherwise(0))
            .cast("long")
            .alias(f"n_{w_s}")
        )
        aggs.append(
            F.sum(F.when(in_w, F.col("e")).otherwise(0))
            .cast("long")
            .alias(f"e_{w_s}")
        )
    return _burn_rule_table(spark, b.agg(*aggs))


@register(
    "events_burn_rate_hopping",
    oracle=f"""
        WITH b AS (
            SELECT epoch_us(ts) // {_BURN_BUCKET_S * 1000000} AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count_if(event_type = 'error') AS BIGINT) AS e
            FROM events GROUP BY 1
        ),
        mx AS (SELECT max(bucket) AS mb FROM b),
        one AS (
            SELECT
                {", ".join(
                    f"CAST(sum(CASE WHEN bucket > mb - {w // _BURN_BUCKET_S} THEN n ELSE 0 END) AS BIGINT) AS n_{w}, "
                    f"CAST(sum(CASE WHEN bucket > mb - {w // _BURN_BUCKET_S} THEN e ELSE 0 END) AS BIGINT) AS e_{w}"
                    for w in _BURN_WINDOWS
                )}
            FROM b CROSS JOIN mx
        )
        SELECT r.rule, r.long_s, r.short_s,
               (CASE r.long_s {" ".join(f"WHEN {w} THEN (e_{w} * 1000000) // n_{w}" for w in _BURN_WINDOWS)} END) AS long_burn4,
               (CASE r.short_s {" ".join(f"WHEN {w} THEN (e_{w} * 1000000) // n_{w}" for w in _BURN_WINDOWS)} END) AS short_burn4,
               CAST(CASE WHEN
                   (CASE r.long_s {" ".join(f"WHEN {w} THEN (e_{w} * 1000000) // n_{w}" for w in _BURN_WINDOWS)} END) >= r.thr4
                   AND
                   (CASE r.short_s {" ".join(f"WHEN {w} THEN (e_{w} * 1000000) // n_{w}" for w in _BURN_WINDOWS)} END) >= r.thr4
                   THEN 1 ELSE 0 END AS BIGINT) AS fired
        FROM (VALUES {", ".join(f"('{r[0]}', {r[1]}, {r[2]}, CAST({r[3]} * 100 AS BIGINT))" for r in _BURN_RULES)})
             AS r(rule, long_s, short_s, thr4)
        CROSS JOIN one
        ORDER BY rule
    """,
    tags=("events", "sre", "ops", "alerting", "streaming-twin"),
)
def events_burn_rate_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-aligned (hopping) variant of events_burn_rate_alerts:
    events aggregate once into 5-minute buckets, and every rule
    window — an exact whole number of buckets — is evaluated at the
    close of the latest bucket, the way production SRE burn alerts
    evaluate on the scrape/rollup grid rather than per-event.

    This is the batch contract of the streaming twin
    (streaming/burn_rate.py): its stateful stage emits exactly
    bucket_error_counts' rows cumulatively, and its alert evaluation
    IS burn_alerts_from_buckets — so twin parity is structural, not
    coincidental.

    Scale shape: ONE map-side-combining aggregation collapses the
    event stream to one row per 5-minute bucket (bounded by the time
    horizon, not the event volume); everything after operates on that
    bounded table.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    return burn_alerts_from_buckets(spark, bucket_error_counts(ev))


# ---------------------------------------------------------------------------
# events_heavy_changers_wow
# ---------------------------------------------------------------------------

_WOW_TOP = 10


@register(
    "events_heavy_changers_wow",
    oracle=f"""
        WITH mx AS (SELECT max(CAST(ts AS DATE)) AS md FROM events),
        per AS (
            SELECT user_id,
                   CAST(count_if(CAST(ts AS DATE) > md - 7) AS BIGINT)
                       AS c_recent,
                   CAST(count_if(CAST(ts AS DATE) <= md - 7
                                 AND CAST(ts AS DATE) > md - 14)
                        AS BIGINT) AS c_prev
            FROM events CROSS JOIN mx
            GROUP BY user_id
        ),
        ranked AS (
            SELECT user_id, c_prev, c_recent,
                   c_recent - c_prev AS delta,
                   row_number() OVER (
                       ORDER BY abs(c_recent - c_prev) DESC, user_id
                   ) AS rn
            FROM per WHERE c_recent + c_prev > 0
        )
        SELECT user_id, c_prev, c_recent, delta
        FROM ranked WHERE rn <= {_WOW_TOP} ORDER BY rn
    """,
    tags=("events", "ops", "heavy-hitters"),
)
def events_heavy_changers_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_WOW_TOP} individual movers by absolute week-over-week
    activity delta (last 7 calendar days vs the 7 before, anchored at
    the stream's max date): the drill-down that names WHO moved after
    events_growth_accounting says HOW MANY moved — a spiking user is
    an abuse/incident lead, a collapsing one a churn-save lead.
    Deterministic: ties rank by user_id.

    Scale shape: per-user window counts partial-aggregate map-side in
    one events pass (conditional sums vs the broadcast max-date
    scalar); the rank runs over the bounded per-user table and tops
    out at {_WOW_TOP} rows.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    mx = ev.agg(F.max(F.to_date("ts")).alias("md"))
    per = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.to_date("ts") > F.date_sub(F.col("md"), 7), 1).otherwise(0)
            )
            .cast("long")
            .alias("c_recent"),
            F.sum(
                F.when(
                    (F.to_date("ts") <= F.date_sub(F.col("md"), 7))
                    & (F.to_date("ts") > F.date_sub(F.col("md"), 14)),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("c_prev"),
        )
        .filter(F.col("c_recent") + F.col("c_prev") > 0)
    )
    from pyspark.sql import Window

    ranked = per.withColumn(
        "delta", F.col("c_recent") - F.col("c_prev")
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.abs(F.col("c_recent") - F.col("c_prev")).desc(), "user_id")
        ),
    )
    return (
        ranked.filter(F.col("rn") <= _WOW_TOP)
        .orderBy("rn")
        .select("user_id", "c_prev", "c_recent", "delta")
    )
