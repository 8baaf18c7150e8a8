"""Distributed frequency sketches with engine-exact semantics.

Spark ships approx sketches (HLL++, count_min_sketch) whose binary
states are not reproducible across engines, so they can't be
oracle-checked bit-for-bit (see ``agg_approx``, the one rows-only
query). The Count-Min sketch here is instead built from first
principles on md5 — the one hash Spark and DuckDB compute identically
— so the *whole sketch*, and every estimate read out of it, is
deterministic and cross-engine exact, while keeping the real CMS
guarantee (estimate ≥ true count; error bounded by N/w per row).

Scale shape: the only full-data shuffle is the exact per-key
pre-aggregation (one exchange on the key). The d×w sketch cells are
built from that *aggregated* table — d rows per distinct key, not per
event — and the cell table (d*w rows, here 256) is broadcast back for
the estimate join. At 100 TB: one shuffle over events, everything
after is broadcast-size. This is also the right incremental shape:
sketches of partitions/batches merge by cell-wise addition.

Reference grounding: the reference keeps exact per-key counts in
unbounded Kafka-compacted state (Streamer.java:323-344); a CMS is the
bounded-memory answer at north-star scale, complementing the
Misra-Gries streaming variant (``keyed_heavy_hitters_stateful``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 64  # buckets per row
TOP_N = 20


def _bucket_sql(d_expr: str, key_expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({d_expr} AS VARCHAR) || ':' ||"
        f" CAST({key_expr} AS VARCHAR)), 1, 8)) AS BIGINT) % {CMS_WIDTH}"
    )


@register(
    "agg_countmin_sketch",
    oracle=f"""
        WITH exact AS (
            SELECT user_id, count(*) AS exact_cnt
            FROM events GROUP BY user_id
        ),
        salted AS (
            SELECT user_id, exact_cnt, d,
                   {_bucket_sql("d", "user_id")} AS bucket
            FROM exact, unnest(range(0, {CMS_DEPTH})) AS u(d)
        ),
        cells AS (
            SELECT d, bucket, CAST(sum(exact_cnt) AS BIGINT) AS cell
            FROM salted GROUP BY d, bucket
        ),
        est AS (
            SELECT s.user_id,
                   max(s.exact_cnt) AS exact_cnt,
                   min(c.cell) AS cms_estimate
            FROM salted s JOIN cells c ON s.d = c.d AND s.bucket = c.bucket
            GROUP BY s.user_id
        )
        SELECT user_id, exact_cnt, cms_estimate,
               cms_estimate - exact_cnt AS overcount
        FROM est
        ORDER BY cms_estimate DESC, user_id LIMIT {TOP_N}
    """,
    tags=("sketch", "aggregate", "streaming-adjacent"),
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over events.user_id (depth 4 × width 64) with
    md5-derived bucket hashes, read back as the top-20 keys by
    estimated frequency alongside their exact counts. Every estimate
    satisfies estimate ≥ exact (CMS never undercounts); the overcount
    column surfaces the collision error.

    The sketch is constructed from the exact per-key aggregate — so
    the event-scale data crosses the network once — and the 256-cell
    sketch is broadcast for the readout join."""
    ev = widen(load_table(spark, sf_dir, "events"))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    salted = exact.select(
        "user_id",
        "exact_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("d").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH,
    )
    cells = salted.groupBy("d", "bucket").agg(
        F.sum("exact_cnt").cast("long").alias("cell")
    )
    est = (
        salted.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("user_id")
        .agg(
            F.max("exact_cnt").alias("exact_cnt"),
            F.min("cell").alias("cms_estimate"),
        )
    )
    return (
        est.select(
            "user_id",
            "exact_cnt",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("cms_estimate"), "user_id")
        .limit(TOP_N)
    )


BLOOM_BITS = 4096  # m: filter size in bits
WORD_BITS = 62  # bits packed per BIGINT word (62 dodges the sign bit:
#   DuckDB raises on 1<<63 while Spark wraps — 62 is safe in both)
BLOOM_WORDS = -(-BLOOM_BITS // WORD_BITS)
BLOOM_K = 3  # independent hash functions
ACCTBAL_MIN = 7500.0  # build-side predicate: "high-value customers"


def _bloom_pos_sql(i_expr: str, key_expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({i_expr} AS VARCHAR) || ':' ||"
        f" CAST({key_expr} AS VARCHAR)), 1, 12)) AS BIGINT) % {BLOOM_BITS}"
    )


@register(
    "join_bloom_prefilter",
    oracle=f"""
        WITH build AS (
            SELECT c_custkey FROM customer WHERE c_acctbal > {ACCTBAL_MIN}
        ),
        build_bits AS (
            SELECT {_bloom_pos_sql("i", "c_custkey")} AS pos
            FROM build, unnest(range(0, {BLOOM_K})) AS u(i)
        ),
        bloom AS (
            SELECT pos // {WORD_BITS} AS word,
                   bit_or(CAST(1 AS BIGINT) << CAST(pos % {WORD_BITS} AS INT)) AS mask
            FROM build_bits GROUP BY pos // {WORD_BITS}
        ),
        probe_keys AS (
            SELECT DISTINCT o_custkey FROM orders
        ),
        probe_bits AS (
            SELECT o_custkey, {_bloom_pos_sql("i", "o_custkey")} AS pos
            FROM probe_keys, unnest(range(0, {BLOOM_K})) AS u(i)
        ),
        verdict AS (
            SELECT p.o_custkey,
                   CAST(count(*) FILTER (WHERE
                       (b.mask & (CAST(1 AS BIGINT) << CAST(p.pos % {WORD_BITS} AS INT)))
                       <> 0) = {BLOOM_K} AS INT) AS bloom_pass
            FROM probe_bits p LEFT JOIN bloom b ON p.pos // {WORD_BITS} = b.word
            GROUP BY p.o_custkey
        ),
        truth AS (
            SELECT v.o_custkey, v.bloom_pass,
                   CAST(v.o_custkey IN (SELECT c_custkey FROM build) AS INT)
                       AS true_match
            FROM verdict v
        )
        SELECT count(*) AS probe_orders,
               CAST(sum(t.bloom_pass) AS BIGINT) AS bloom_pass_orders,
               CAST(sum(t.true_match) AS BIGINT) AS true_match_orders,
               CAST(sum(t.bloom_pass) - sum(t.true_match) AS BIGINT)
                   AS false_positive_orders
        FROM orders o JOIN truth t ON o.o_custkey = t.o_custkey
    """,
    tags=("join", "sketch", "scale"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning — the shuffle-avoidance pattern
    for joining a 100 TB fact table against a selective dimension
    subset: hash the build side's keys into a 4096-bit Bloom bitset
    (k=3 md5-derived probes, bit_or-aggregated into 62-bit BIGINT words),
    broadcast the words, and test every probe key against the bitset
    BEFORE any fact-table shuffle. Rows failing the filter never cross
    the network; false positives (reported here) are culled by the
    real join afterwards.

    The whole filter is deterministic md5 arithmetic, so build, probe,
    and the false-positive count are engine-exact — unlike Spark's
    internal runtime bloom filter (whose binary state is not
    reproducible), this one is oracle-checkable bit for bit.

    Scale shape: probe keys are DISTINCT'd before hashing (custkey
    cardinality << order count), the bitset is 512 bytes, and the
    final stats aggregation joins orders to per-key verdicts with a
    broadcast hash join — zero event-scale shuffles."""
    cust = load_table(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_acctbal") > ACCTBAL_MIN).select("c_custkey")

    def positions(df: DataFrame, key: str) -> DataFrame:
        return df.select(
            key,
            F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("i"),
        ).withColumn(
            "pos",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("i").cast("string"),
                            F.lit(":"),
                            F.col(key).cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            % BLOOM_BITS,
        )

    bloom = (
        positions(build, "c_custkey")
        .select(
            F.expr(f"pos div {WORD_BITS}").alias("word"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(pos % {WORD_BITS} as int))").alias(
                "bit"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("mask"))
    )

    orders = widen(load_table(spark, sf_dir, "orders")).select("o_custkey")
    probe_keys = orders.distinct()
    verdict = (
        positions(probe_keys, "o_custkey")
        .join(F.broadcast(bloom), F.expr(f"pos div {WORD_BITS}") == F.col("word"), "left")
        .groupBy("o_custkey")
        .agg(
            (
                F.count(
                    F.when(
                        F.col("mask").bitwiseAND(
                            F.expr(
                                f"shiftleft(cast(1 as bigint),"
                                f" cast(pos % {WORD_BITS} as int))"
                            )
                        )
                        != 0,
                        1,
                    )
                )
                == BLOOM_K
            )
            .cast("int")
            .alias("bloom_pass")
        )
    )
    truth = verdict.join(
        F.broadcast(build.withColumn("true_match", F.lit(1))),
        verdict.o_custkey == F.col("c_custkey"),
        "left",
    ).select(
        "o_custkey",
        "bloom_pass",
        F.coalesce(F.col("true_match"), F.lit(0)).alias("true_match"),
    )
    return (
        orders.join(F.broadcast(truth), "o_custkey")
        .agg(
            F.count(F.lit(1)).alias("probe_orders"),
            F.sum("bloom_pass").cast("long").alias("bloom_pass_orders"),
            F.sum("true_match").cast("long").alias("true_match_orders"),
            (F.sum("bloom_pass") - F.sum("true_match"))
            .cast("long")
            .alias("false_positive_orders"),
        )
    )


@register(
    "agg_hll_sketch_daily_merge",
    oracle=None,  # Datasketches HLL binary sketches are engine-specific
    tags=("relational", "agg", "approx", "sketch"),
)
def agg_hll_sketch_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Spark 4 Datasketches HLL):
    one sketch of user_id per day, then a cross-day union — the
    production shape for distinct counting at 100 TB, where the daily
    sketches are PERSISTED (bytes columns in a rollup table) and any
    date-range distinct count is a sketch union over the range, never
    a rescan of the raw events.

    Rows-only by design (like agg_approx): DuckDB's HLL is a
    different sketch implementation, so there is no cross-engine
    oracle for the estimate; `tests/test_sketches.py::
    test_hll_daily_merge_accuracy` bounds the estimate against the
    exact distinct instead (Datasketches HLL_4 lgK=12 has ~1.6%
    relative standard error; the test allows 5%).

    Scale: each day's sketch is built map-side (partial hll_sketch_agg
    per scan partition, merged per day) — the shuffle carries one
    ~2.5 KB sketch per (partition, day), not user ids. The final
    union reduces |days| sketches to one row.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("long")
        .alias("distinct_users_estimate"),
    )


@register(
    "agg_theta_setops_audience",
    oracle=None,  # Datasketches Theta binary sketches are engine-specific
    tags=("relational", "agg", "approx", "sketch", "setop"),
)
def agg_theta_setops_audience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra on Theta sketches (Spark 4 Datasketches):
    purchase vs click user sets — union, intersection, and difference
    estimated from two per-segment sketches, with the exact counts
    computed alongside for the accuracy contract. Theta is the sketch
    that supports INTERSECTION and A-NOT-B (HLL only unions), which is
    why it's the production answer to "how many purchasers also
    clicked" at 100 TB: per-segment sketches are persisted and any
    audience overlap question is sketch algebra in milliseconds,
    never a fact-table join.

    Rows-only by design (same policy as agg_hll_sketch_daily_merge):
    the sketch bytes are engine-specific, so the test suite bounds
    the estimates against the exact columns this query itself emits
    (below ~4096 distinct keys a Theta sketch is in exact mode, so at
    test scale the estimates are equal, not just close).

    Scale: each segment sketch builds map-side (partial
    theta_sketch_agg per scan partition); the shuffle carries one
    ≤32 KB sketch per partition per segment, and all set operations
    run on the two final sketches — one row out.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    seg = lambda tp: F.theta_sketch_agg(  # noqa: E731
        F.when(F.col("event_type") == tp, F.col("user_id"))
    )
    exact = lambda tp: F.count_distinct(  # noqa: E731
        F.when(F.col("event_type") == tp, F.col("user_id"))
    )
    sk = ev.agg(
        seg("purchase").alias("sk_p"),
        seg("click").alias("sk_c"),
        exact("purchase").cast("long").alias("exact_purchasers"),
        exact("click").cast("long").alias("exact_clickers"),
        F.count_distinct(
            F.when(F.col("event_type").isin("purchase", "click"), F.col("user_id"))
        )
        .cast("long")
        .alias("exact_either"),
    )
    return sk.select(
        "exact_purchasers",
        "exact_clickers",
        "exact_either",
        F.theta_sketch_estimate(F.theta_union("sk_p", "sk_c"))
        .cast("long")
        .alias("est_union"),
        F.theta_sketch_estimate(F.theta_intersection("sk_p", "sk_c"))
        .cast("long")
        .alias("est_intersect"),
        F.theta_sketch_estimate(F.theta_difference("sk_p", "sk_c"))
        .cast("long")
        .alias("est_purchase_only"),
    )


@register(
    "agg_kll_value_quantiles",
    oracle=None,  # Datasketches KLL binary sketches are engine-specific
    tags=("relational", "agg", "approx", "sketch", "percentile"),
)
def agg_kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-mergeable quantiles via KLL sketches (Spark 4
    Datasketches): per-event-type p50/p95 of ``value`` from one sketch
    per group, each built map-side and merged — the rank-error-bounded
    answer to percentiles over data too big to sort. Completes the
    percentile family: exact-sorted (agg_percentile_cont_manual /
    agg_median_exact), t-digest-style approximate (agg_approx), and
    now a MERGEABLE sketch that can be persisted per day/shard and
    re-queried at any rank without rescanning (same production shape
    as the HLL and Theta rollups).

    Rows-only by design: sketch internals are engine-specific; the
    accuracy contract lives in tests (KLL k=200 has ~1.65% one-sided
    rank error at 99% confidence; the test checks the returned value's
    true rank against that bound).

    Scale: the shuffle carries one ~KB sketch per scan partition per
    group; quantile readout is O(k). n is carried from the sketch
    itself (kll_sketch_get_n) — no second count pass.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    sk = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    return (
        sk.select(
            "event_type",
            F.kll_sketch_get_n_double("sk").cast("long").alias("n"),
            F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 6).alias(
                "p50_est"
            ),
            F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.95)), 6).alias(
                "p95_est"
            ),
        )
        .orderBy("event_type")
    )
