"""Round-11 batch 244: training-data split hygiene, traffic shape
profiles, market-basket lift, Benford audit, Gini concentration, and
order-cadence regularity.

* ``sample_holdout_leakage_audit`` — deterministic 98/1/1
  train/val/test split by md5(doc_id), then counts NEAR-DUP pairs
  (dedup_ngram_jaccard's truth) that span different splits — the
  decontamination leakage check every eval pipeline needs before
  trusting a holdout.
* ``events_interarrival_buckets`` — per-user inter-event gap
  distribution over decade buckets (1ms…1000s), pure integer
  comparisons.
* ``supplier_affinity_lift`` — market-basket lift for supplier pairs
  co-occurring in an order, exact fixed-point lift4.
* ``events_value_benford`` — first-significant-digit distribution of
  event values (fraud/synthetic-data smell test), digits extracted
  from exact integer cents.
* ``text_token_count_gini`` — Gini coefficient of per-document token
  counts, computed entirely in integer arithmetic (rank-weighted sum
  identity), floor-scaled to gini4.
* ``events_dow_hour_profile`` — weekly seasonality grid (day-of-week
  x hour), day/hour indices derived from epoch integers so both
  engines share the exact same calendar arithmetic.
* ``orders_priority_mix_shift`` — quarterly order-priority
  composition with share-point deltas vs the previous quarter.
* ``customer_order_gap_regularity`` — per-customer order cadence:
  exact mean/min/max inter-order gaps and a min/max regularity
  ratio.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B closure and
LLM-pipeline split hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators.dedup import _ngram_jaccard_pairs
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# sample_holdout_leakage_audit
# ---------------------------------------------------------------------------

# md5-bucket split: bucket 0 -> val, bucket 1 -> test, rest -> train
# (98/1/1 over 100 hash buckets; deterministic, engine-identical)
_SPLIT_SQL = """
    CASE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 100)
        WHEN 0 THEN 'val' WHEN 1 THEN 'test' ELSE 'train' END
"""


@register(
    "sample_holdout_leakage_audit",
    oracle=f"""
        WITH words AS (SELECT doc_id,
                string_split_regex(lower(text), '\\s+') AS w
            FROM documents),
        sh AS (SELECT doc_id, unnest(
                   list_distinct(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
               FROM words WHERE len(w) >= 3),
        dfreq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
        posting AS (
            SELECT p.doc_id, p.s FROM sh p
            JOIN dfreq d ON p.s = d.s AND d.df <= 64
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM posting GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM posting a JOIN posting b
                ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT doc_a, doc_b FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.2
        ),
        split AS (SELECT doc_id, {_SPLIT_SQL} AS split
                  FROM documents)
        SELECT LEAST(pa.split, pb.split) AS split_a,
               GREATEST(pa.split, pb.split) AS split_b,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs
        JOIN split pa ON pa.doc_id = doc_a
        JOIN split pb ON pb.doc_id = doc_b
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("llm-data", "sampling", "dedup", "decontamination"),
)
def sample_holdout_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout-leakage audit: split the corpus 98/1/1 into
    train/val/test by md5(doc_id) bucket (deterministic, no RNG), then
    count near-dup pairs (the ngram-Jaccard truth pipeline,
    operators/dedup.py) by the UNORDERED split pair they span — any
    (train, test) or (train, val) mass is evaluation contamination
    that survives naive splitting and is exactly what SemDeDup-style
    decontamination removes.

    Scale shape: reuses the inverted-index near-dup plan unchanged
    (df-capped postings, merge-hinted self-join); the split map is a
    projection of documents joined twice by doc_id, and the result
    aggregates to at most 6 unordered split pairs.
    """
    pairs = _ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    d = widen(load_table(spark, sf_dir, "documents"))
    split = d.select(
        "doc_id",
        F.expr(
            "CASE (CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 100)"
            " WHEN 0 THEN 'val' WHEN 1 THEN 'test' ELSE 'train' END"
        ).alias("split"),
    )
    pa = split.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    pb = split.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    return (
        pairs.join(pa.hint("merge"), "doc_a")
        .join(pb.hint("merge"), "doc_b")
        .groupBy(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("split_a", "split_b")
    )


# ---------------------------------------------------------------------------
# events_interarrival_buckets
# ---------------------------------------------------------------------------

_GAP_BUCKETS = (  # upper bounds in microseconds, decade ladder
    (1_000, "<1ms"),
    (10_000, "<10ms"),
    (100_000, "<100ms"),
    (1_000_000, "<1s"),
    (10_000_000, "<10s"),
    (100_000_000, "<100s"),
    (1_000_000_000, "<1000s"),
)


@register(
    "events_interarrival_buckets",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, epoch_us(ts) AS us,
                   LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_us
            FROM events
        ),
        gaps AS (SELECT us - prev_us AS gap FROM seq WHERE prev_us IS NOT NULL)
        SELECT CASE
            {" ".join(f"WHEN gap < {ub} THEN '{label}'" for ub, label in _GAP_BUCKETS)}
            ELSE '>=1000s' END AS bucket,
            CAST(count(*) AS BIGINT) AS n_gaps
        FROM gaps GROUP BY 1 ORDER BY min(gap)
    """,
    tags=("events", "ops", "window", "histogram"),
)
def events_interarrival_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap distribution over a decade bucket
    ladder (1 ms … 1000 s) — the traffic-shape profile that sizes
    session timeouts and stream watermarks. Buckets are pure integer
    comparisons on exact microsecond gaps; rows order by each
    bucket's min gap so the ladder reads smallest-first on both
    engines.

    Scale shape: one per-user LAG window (single user_id shuffle) and
    one bounded aggregation.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = ev.select("user_id", us.alias("us"), F.lag(us).over(w).alias("prev_us"))
    gaps = seq.filter(F.col("prev_us").isNotNull()).select(
        (F.col("us") - F.col("prev_us")).alias("gap")
    )
    expr = F.lit(">=1000s")
    for ub, label in reversed(_GAP_BUCKETS):
        expr = F.when(F.col("gap") < ub, F.lit(label)).otherwise(expr)
    return (
        gaps.groupBy(expr.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.min("gap").alias("_mg"),
        )
        .orderBy("_mg")
        .select("bucket", "n_gaps")
    )


# ---------------------------------------------------------------------------
# supplier_affinity_lift
# ---------------------------------------------------------------------------

_LIFT_TOP = 20


@register(
    "supplier_affinity_lift",
    oracle=f"""
        WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
              FROM os),
        per AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_s
                FROM os GROUP BY 1),
        pair AS (
            SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
                   CAST(count(*) AS BIGINT) AS n_ab
            FROM os a JOIN os b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
        )
        SELECT supp_a, supp_b, n_ab,
               (n_ab * n.n_orders * 10000) // (pa.n_s * pb.n_s) AS lift4
        FROM pair
        JOIN per pa ON pa.l_suppkey = supp_a
        JOIN per pb ON pb.l_suppkey = supp_b
        CROSS JOIN n
        ORDER BY lift4 DESC, supp_a, supp_b LIMIT {_LIFT_TOP}
    """,
    tags=("lineitem", "market-basket", "lift"),
)
def supplier_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift for supplier pairs co-occurring in an order:
    lift = P(a,b) / (P(a)P(b)) in exact fixed point (lift4 =
    n_ab * n_orders * 10000 div (n_a * n_b)); top pairs with a
    (supp_a, supp_b) total-order tie-break.

    Scale shape: the pair join is keyed by l_orderkey, so candidate
    volume is sum per order of C(suppliers_in_order, 2) — bounded by
    order width, never all-pairs across suppliers; the per-supplier
    marginals broadcast.
    """
    li = widen(load_table(spark, sf_dir, "lineitem"))
    os_ = li.select("l_orderkey", "l_suppkey").distinct()
    n = os_.agg(F.count_distinct("l_orderkey").cast("long").alias("n_orders"))
    per = os_.groupBy("l_suppkey").agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    a = os_.alias("a")
    b = os_.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("supp_a"),
            F.col("b.l_suppkey").alias("supp_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    pa = per.select(F.col("l_suppkey").alias("supp_a"), F.col("n_s").alias("na"))
    pb = per.select(F.col("l_suppkey").alias("supp_b"), F.col("n_s").alias("nb"))
    return (
        pair.join(F.broadcast(pa), "supp_a")
        .join(F.broadcast(pb), "supp_b")
        .crossJoin(F.broadcast(n))
        .select(
            "supp_a",
            "supp_b",
            "n_ab",
            F.expr("(n_ab * n_orders * 10000) div (na * nb)").alias("lift4"),
        )
        .orderBy(F.desc("lift4"), "supp_a", "supp_b")
        .limit(_LIFT_TOP)
    )


# ---------------------------------------------------------------------------
# events_value_benford
# ---------------------------------------------------------------------------


@register(
    "events_value_benford",
    oracle="""
        WITH cents AS (
            SELECT CAST(floor(value * 100) AS BIGINT) AS c FROM events
            WHERE value > 0
        ),
        digits AS (
            SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS d
            FROM cents
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM digits)
        SELECT d AS first_digit,
               CAST(count(*) AS BIGINT) AS n_values,
               (count(*) * 10000) // tot.n AS share4
        FROM digits CROSS JOIN tot
        GROUP BY 1, tot.n ORDER BY 1
    """,
    tags=("events", "audit", "benford"),
)
def events_value_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of event values (the
    Benford smell test for synthetic or manipulated value columns).
    Digits come from exact integer cents (floor(value*100)), so both
    engines stringify the same integer — never a double format.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    cents = ev.filter(F.col("value") > 0).select(
        F.floor(F.col("value") * 100).cast("long").alias("c")
    )
    digits = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("d")
    )
    tot = digits.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        digits.crossJoin(F.broadcast(tot))
        .groupBy(F.col("d").alias("first_digit"), "n")
        .agg(F.count(F.lit(1)).cast("long").alias("n_values"))
        .select(
            "first_digit",
            "n_values",
            F.expr("(n_values * 10000) div n").alias("share4"),
        )
        .orderBy("first_digit")
    )


# ---------------------------------------------------------------------------
# text_token_count_gini
# ---------------------------------------------------------------------------


@register(
    "text_token_count_gini",
    oracle="""
        WITH per AS (
            SELECT doc_id,
                   CAST(len(string_split_regex(lower(text), '\\s+'))
                        AS BIGINT) AS x
            FROM documents
        ),
        ranked AS (
            SELECT x, ROW_NUMBER() OVER (ORDER BY x, doc_id) AS rn FROM per
        ),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(rn * x) AS BIGINT) AS srx
            FROM ranked
        )
        SELECT n AS n_docs, sx AS total_tokens,
               ((2 * srx - (n + 1) * sx) * 10000) // (n * sx) AS gini4
        FROM agg
    """,
    tags=("llm-data", "text", "concentration"),
)
def text_token_count_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-document token counts — the
    length-concentration number behind token-budget curation: by the
    rank-weighted identity G = (2*Σ rn*x - (n+1)*Σx) / (n*Σx) the
    whole computation stays in exact integer arithmetic until one
    final fixed-point division (gini4).

    Scale shape: NO global per-row rank (a row_number over every doc
    would single-partition the corpus): within a tie group of equal x
    the rank-weighted sum x*Σrn is invariant to intra-group order, so
    Σ rn*x folds to the DISTINCT-x table — x*(cum_before*k + k(k+1)/2)
    per group — and the only window runs over the bounded
    distinct-length domain.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    per = d.select(
        F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias("x"),
    )
    byx = per.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("k"))
    w = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grp = byx.select(
        "x", "k", (F.sum("k").over(w) - F.col("k")).alias("cum_before")
    )
    agg = grp.agg(
        F.sum("k").cast("long").alias("n"),
        F.sum(F.col("x") * F.col("k")).cast("long").alias("sx"),
        F.sum(
            F.col("x")
            * (
                F.col("cum_before") * F.col("k")
                + F.expr("k * (k + 1) div 2")
            )
        )
        .cast("long")
        .alias("srx"),
    )
    return agg.select(
        F.col("n").alias("n_docs"),
        F.col("sx").alias("total_tokens"),
        F.expr("((2 * srx - (n + 1) * sx) * 10000) div (n * sx)").alias(
            "gini4"
        ),
    )


# ---------------------------------------------------------------------------
# events_dow_hour_profile
# ---------------------------------------------------------------------------


@register(
    "events_dow_hour_profile",
    oracle="""
        WITH g AS (
            SELECT ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow_idx,
                   (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ),
        tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS n FROM g)
        SELECT dow_idx, hour, n_events,
               (n_events * 10000) // tot.n AS share4
        FROM g CROSS JOIN tot ORDER BY dow_idx, hour
    """,
    tags=("events", "temporal", "seasonality"),
)
def events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality grid: events by (day-of-week, hour-of-day),
    with a fixed-point share of total. Day/hour indices derive from
    epoch integer division ((days_since_epoch + 3) % 7, 0 = Monday —
    1970-01-01 was a Thursday), so both engines share the exact same
    calendar arithmetic instead of their differing dayofweek()
    conventions.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    # integer-division forms (expr to guarantee `div`, not double `/`)
    g = (
        ev.select(
            F.expr(
                "((unix_micros(ts) div 86400000000) + 3) % 7"
            ).alias("dow_idx"),
            F.expr(
                "(unix_micros(ts) % 86400000000) div 3600000000"
            ).alias("hour"),
        )
        .groupBy("dow_idx", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    tot = g.agg(F.sum("n_events").cast("long").alias("n"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "dow_idx",
            "hour",
            "n_events",
            F.expr("(n_events * 10000) div n").alias("share4"),
        )
        .orderBy("dow_idx", "hour")
    )


# ---------------------------------------------------------------------------
# orders_priority_mix_shift
# ---------------------------------------------------------------------------


@register(
    "orders_priority_mix_shift",
    oracle="""
        WITH q AS (
            SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE)
                       AS quarter,
                   o_orderpriority AS priority,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1, 2
        ),
        tot AS (
            SELECT quarter, CAST(sum(n_orders) AS BIGINT) AS qn
            FROM q GROUP BY 1
        ),
        share AS (
            SELECT q.quarter, q.priority, q.n_orders,
                   (q.n_orders * 10000) // tot.qn AS share4
            FROM q JOIN tot ON tot.quarter = q.quarter
        )
        SELECT quarter, priority, n_orders, share4,
               share4 - LAG(share4) OVER (PARTITION BY priority
                                          ORDER BY quarter) AS shift4
        FROM share ORDER BY quarter, priority
    """,
    tags=("orders", "temporal", "composition"),
)
def orders_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarterly order-priority composition (fixed-point share of the
    quarter) and the share-point shift vs the same priority's previous
    quarter — the mix-shift report behind demand-planning reviews.

    Scale shape: one groupBy to the bounded (quarter x priority)
    grid; shares and shifts are windows over that grid, not the fact
    table.
    """
    o = widen(load_table(spark, sf_dir, "orders"))
    q = o.groupBy(
        F.to_date(F.date_trunc("quarter", "o_orderdate")).alias("quarter"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    tot = q.groupBy("quarter").agg(F.sum("n_orders").cast("long").alias("qn"))
    share = q.join(tot, "quarter").select(
        "quarter",
        "priority",
        "n_orders",
        F.expr("(n_orders * 10000) div qn").alias("share4"),
    )
    w = Window.partitionBy("priority").orderBy("quarter")
    return share.select(
        "quarter",
        "priority",
        "n_orders",
        "share4",
        (F.col("share4") - F.lag("share4").over(w)).alias("shift4"),
    ).orderBy("quarter", "priority")


# ---------------------------------------------------------------------------
# customer_order_gap_regularity
# ---------------------------------------------------------------------------


@register(
    "customer_order_gap_regularity",
    oracle="""
        WITH seq AS (
            SELECT o_custkey, o_orderdate,
                   LAG(o_orderdate)
                       OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey) AS prev_d
            FROM orders
        ),
        gaps AS (
            SELECT o_custkey,
                   CAST(date_diff('day', prev_d, o_orderdate) AS BIGINT)
                       AS gap
            FROM seq WHERE prev_d IS NOT NULL
        ),
        per AS (
            SELECT o_custkey,
                   CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(sum(gap) AS BIGINT) // count(*) AS mean_gap_days,
                   CAST(min(gap) AS BIGINT) AS min_gap_days,
                   CAST(max(gap) AS BIGINT) AS max_gap_days
            FROM gaps GROUP BY 1 HAVING count(*) >= 2
        )
        SELECT o_custkey, n_gaps, mean_gap_days, min_gap_days, max_gap_days,
               CASE WHEN max_gap_days > 0
                    THEN (min_gap_days * 10000) // max_gap_days
                    END AS regularity4
        FROM per ORDER BY o_custkey
    """,
    tags=("orders", "temporal", "window"),
)
def customer_order_gap_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order cadence for customers with 3+ orders: exact
    integer mean/min/max inter-order gaps and a min/max regularity
    ratio (10000 = perfectly periodic) — the cadence feature feeding
    churn models, kept exact so the oracle is bit-stable.

    Scale shape: one per-customer LAG window and one aggregation — a
    single o_custkey shuffle.

    Gaps are in DAYS (datediff on the TIMESTAMP_NTZ order dates —
    order placement is day-granular in TPC-H, and day arithmetic
    avoids any NTZ-to-epoch session-timezone dependence).
    """
    o = widen(load_table(spark, sf_dir, "orders"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_d"),
    )
    gaps = seq.filter(F.col("prev_d").isNotNull()).select(
        "o_custkey",
        F.datediff("o_orderdate", "prev_d").cast("long").alias("gap"),
    )
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.expr("sum(gap) div count(*)").alias("mean_gap_days"),
            F.min("gap").cast("long").alias("min_gap_days"),
            F.max("gap").cast("long").alias("max_gap_days"),
        )
        .filter(F.col("n_gaps") >= 2)
        .select(
            "o_custkey",
            "n_gaps",
            "mean_gap_days",
            "min_gap_days",
            "max_gap_days",
            F.expr(
                "CASE WHEN max_gap_days > 0"
                " THEN (min_gap_days * 10000) div max_gap_days END"
            ).alias("regularity4"),
        )
        .orderBy("o_custkey")
    )
