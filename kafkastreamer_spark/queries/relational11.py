"""Round-3 closure batch: interval-overlap join, weighted hash
reservoir, hybrid-retrieval rank fusion, rolling distinct users.

The reference has no relational surface (its operators are the keyed
arithmetic stages, Streamer.java:443-466); these extend the engine's
capability closure along shapes Spark has no native operator for:

* interval overlap join — Spark would plan a bare ``a.s <= b.e AND
  b.s <= a.e`` condition as BroadcastNestedLoopJoin (all-pairs); the
  bucketed form makes it an equi join;
* sliding-window COUNT(DISTINCT) — non-mergeable, so no window
  function computes it; the bounded explode makes it a plain groupBy;
* reciprocal-rank fusion — the standard hybrid-search combiner over
  two retriever rankings;
* weighted sampling — deterministic hash-priority variant of the
  Efraimidis–Spirakis exponential race, transcendental-free so both
  engines rank identically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import cosine, dot
from kafkastreamer_spark.queries._util import epoch_us
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

HOUR_US = 3_600_000_000  # interval-join bucket width
SPAN_US = 600_000_000  # each event opens a 10-minute interval


@register(
    "join_interval_overlap",
    oracle=f"""
        WITH a AS (
            SELECT event_id AS a_id, epoch_us(ts) AS a_s,
                   epoch_us(ts) + {SPAN_US} AS a_e
            FROM events WHERE event_type = 'error'
        ),
        b AS (
            SELECT event_id AS b_id, epoch_us(ts) AS b_s,
                   epoch_us(ts) + {SPAN_US} AS b_e
            FROM events WHERE event_type = 'purchase'
        )
        SELECT a_id, b_id,
               (LEAST(a_e, b_e) - GREATEST(a_s, b_s)) AS overlap_us
        FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
        ORDER BY a_id, b_id
    """,
    tags=("relational", "join", "interval"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join (error windows x purchase windows) via
    hour-bucket blocking. A bare ``a_s <= b_e AND b_s <= a_e`` theta
    condition gives Catalyst nothing to hash on — the plan degrades to
    BroadcastNestedLoopJoin, |A|x|B| comparisons. Here each 10-minute
    interval explodes to the 1-2 hour buckets it covers, the join is a
    plain shuffled equi join on the bucket, and a pair is emitted only
    in the bucket containing its overlap START (``GREATEST(a_s, b_s)
    div hour``) — every overlapping pair matches in exactly one
    bucket, so no DISTINCT/dedup shuffle is needed afterwards.

    Scale shape: candidate volume is sum over buckets of |A_b| x |B_b|
    — controlled by bucket width relative to interval density, the
    same guardrail as the LSH band joins. Hot buckets are AQE
    skew-join territory; widening HOUR_US trades fan-out (rows explode
    to span/bucket + 1 copies) against bucket occupancy.
    """
    ev = widen(load_table(spark, sf_dir, "events"))

    def side(event_type: str, tag: str) -> DataFrame:
        s = epoch_us("ts")
        return ev.filter(F.col("event_type") == event_type).select(
            F.col("event_id").alias(f"{tag}_id"),
            s.alias(f"{tag}_s"),
            (s + SPAN_US).alias(f"{tag}_e"),
        )

    a = side("error", "a").withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.expr(f"a_s div {HOUR_US}"), F.expr(f"a_e div {HOUR_US}")
            )
        ),
    )
    b = side("purchase", "b").withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.expr(f"b_s div {HOUR_US}"), F.expr(f"b_e div {HOUR_US}")
            )
        ),
    )
    return (
        a.join(b, "bkt")
        .filter(
            (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e"))
            & F.expr(f"bkt = (greatest(a_s, b_s) div {HOUR_US})")
        )
        .select(
            "a_id",
            "b_id",
            (F.least("a_e", "b_e") - F.greatest("a_s", "b_s")).alias("overlap_us"),
        )
        .orderBy("a_id", "b_id")
    )


RESERVOIR_K = 50


@register(
    "sample_weighted_reservoir",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, lang, n_chars,
                   CAST(FLOOR(
                       CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                                 AS BIGINT) AS DOUBLE) / n_chars
                   ) AS BIGINT) AS pri
            FROM documents
        )
        SELECT doc_id, lang, n_chars, pri
        FROM keyed ORDER BY pri, doc_id LIMIT {RESERVOIR_K}
    """,
    tags=("sampling", "training-data"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted reservoir sample (k docs, probability ∝
    n_chars): the hash-priority variant of the Efraimidis–Spirakis
    exponential race. Each doc draws a 48-bit uniform from md5(doc_id)
    and competes with priority floor(u / weight); the k smallest win.
    P(pri < t) = P(u < t·w) ∝ w, so selection probability is linear in
    the weight exactly as in A-ES, but without ln()/pow() — libm
    transcendentals are not bit-identical across engines, while md5,
    IEEE division, and floor are, so the sampled SET (not just its
    size) is reproducible anywhere.

    Scale shape: priority is a map-side projection; ORDER BY + LIMIT
    plans as TakeOrderedAndProject — each task keeps its local top-k
    and only k rows per task reach the driver merge. No full sort, no
    exchange of the table. Appends are monotone: a new doc can enter
    the reservoir but never reshuffles survivors' priorities.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
    pri = F.floor(u.cast("double") / F.col("n_chars")).cast("long")
    return (
        d.select("doc_id", "lang", "n_chars", pri.alias("pri"))
        .orderBy("pri", "doc_id")
        .limit(RESERVOIR_K)
    )


RRF_K = 60  # standard reciprocal-rank-fusion damping constant
RRF_POOL = 20  # per-retriever candidate list depth
RRF_TOP = 5
N_QUERIES = 10


@register(
    "search_hybrid_rrf",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
        scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   list_dot_product(q.qv, e.v)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(e.v, e.v))) AS c,
                   list_dot_product(q.qv, e.v) AS d
            FROM q JOIN e ON e.vec_id != q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY c DESC, neighbor_id) AS r_cos,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY d DESC, neighbor_id) AS r_dot
            FROM scored
        ),
        fused AS (
            SELECT query_id, neighbor_id,
                   CAST(CASE WHEN r_cos <= {RRF_POOL} THEN r_cos END AS BIGINT)
                       AS rank_cos,
                   CAST(CASE WHEN r_dot <= {RRF_POOL} THEN r_dot END AS BIGINT)
                       AS rank_dot,
                   (CASE WHEN r_cos <= {RRF_POOL}
                         THEN CAST(1 AS DOUBLE) / ({RRF_K} + r_cos)
                         ELSE CAST(0 AS DOUBLE) END
                    + CASE WHEN r_dot <= {RRF_POOL}
                           THEN CAST(1 AS DOUBLE) / ({RRF_K} + r_dot)
                           ELSE CAST(0 AS DOUBLE) END) AS rrf
            FROM ranked
            WHERE r_cos <= {RRF_POOL} OR r_dot <= {RRF_POOL}
        ),
        top AS (
            SELECT query_id, neighbor_id, rank_cos, rank_dot,
                   CAST(FLOOR(rrf * 10000000) AS BIGINT) AS rrf7,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY rrf DESC, neighbor_id) AS rk
            FROM fused
        )
        SELECT query_id, neighbor_id, rank_cos, rank_dot, rrf7,
               CAST(rk AS BIGINT) AS rank
        FROM top WHERE rk <= {RRF_TOP}
        ORDER BY query_id, rank
    """,
    tags=("llm-data", "similarity", "search"),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval reciprocal-rank fusion (Cormack et al. 2009):
    two retrievers rank the corpus per query — cosine (angle) and raw
    inner product (magnitude-sensitive, the max-inner-product-search
    objective) — and candidates in either top-20 list are fused by
    Σ 1/(60 + rank). RRF needs only ranks, never score calibration,
    which is why it is the default combiner for lexical+dense hybrid
    search; here the two dense scorers disagree exactly when vector
    norms vary, so the fused order differs from both inputs.

    Scale shape: the 10 query vectors broadcast; the corpus streams
    once computing both scores in one projection. Both rank windows
    partition on query_id → ONE exchange of (query, neighbor, c, d)
    triples serves both sorts, and rows outside both top-20 pools are
    dropped before the (tiny) fusion re-rank. The rrf score is emitted
    fixed-point (floor x 1e7) so cross-engine hashing is exact.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("v")).alias("c"),
        dot(F.col("qv"), F.col("v")).alias("d"),
    )
    w_cos = Window.partitionBy("query_id").orderBy(F.desc("c"), "neighbor_id")
    w_dot = Window.partitionBy("query_id").orderBy(F.desc("d"), "neighbor_id")
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w_cos).alias("r_cos"),
        F.row_number().over(w_dot).alias("r_dot"),
    )
    in_cos = F.col("r_cos") <= RRF_POOL
    in_dot = F.col("r_dot") <= RRF_POOL
    term = lambda flag, r: F.when(  # noqa: E731
        flag, F.lit(1.0) / (F.lit(RRF_K) + F.col(r))
    ).otherwise(F.lit(0.0))
    fused = ranked.filter(in_cos | in_dot).select(
        "query_id",
        "neighbor_id",
        F.when(in_cos, F.col("r_cos")).cast("long").alias("rank_cos"),
        F.when(in_dot, F.col("r_dot")).cast("long").alias("rank_dot"),
        (term(in_cos, "r_cos") + term(in_dot, "r_dot")).alias("rrf"),
    )
    w_rrf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), "neighbor_id")
    return (
        fused.withColumn("rk", F.row_number().over(w_rrf))
        .filter(F.col("rk") <= RRF_TOP)
        .select(
            "query_id",
            "neighbor_id",
            "rank_cos",
            "rank_dot",
            F.floor(F.col("rrf") * 10000000).alias("rrf7"),
            F.col("rk").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


_COGROUP_SCHEMA = (
    "user_id long, n_purch long, n_click long,"
    " first_purch_us long, clicks_after long"
)


def _purchase_click_stats(key, purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
    """Cogrouped pandas function: BOTH per-user groups arrive together
    as two frames (either possibly empty — cogroup keys are the union
    of both sides). Integer-only outputs, order-insensitive within the
    group, so the result is exact across partitionings. -1 sentinels
    the no-purchase case (nullable ints round-trip as floats through
    pandas, which would break the value hash)."""
    n_p, n_c = len(purchases), len(clicks)
    first = int(purchases["us"].min()) if n_p else -1
    after = int((clicks["us"] >= first).sum()) if (n_p and n_c) else 0
    return pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_purch": [n_p],
            "n_click": [n_c],
            "first_purch_us": [first],
            "clicks_after": [after],
        }
    )


@register(
    "udf_cogrouped_purchase_clicks",
    oracle="""
        WITH p AS (
            SELECT user_id, COUNT(*) AS n_purch, MIN(epoch_us(ts)) AS first_us
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ),
        c AS (
            SELECT user_id, COUNT(*) AS n_click
            FROM events WHERE event_type = 'click' GROUP BY user_id
        ),
        ca AS (
            SELECT e.user_id, COUNT(*) AS n_after
            FROM events e JOIN p ON e.user_id = p.user_id
            WHERE e.event_type = 'click' AND epoch_us(e.ts) >= p.first_us
            GROUP BY e.user_id
        )
        SELECT COALESCE(p.user_id, c.user_id) AS user_id,
               COALESCE(n_purch, 0) AS n_purch,
               COALESCE(n_click, 0) AS n_click,
               COALESCE(first_us, -1) AS first_purch_us,
               COALESCE(n_after, 0) AS clicks_after
        FROM p FULL OUTER JOIN c ON p.user_id = c.user_id
        LEFT JOIN ca ON COALESCE(p.user_id, c.user_id) = ca.user_id
        ORDER BY user_id
    """,
    tags=("udf", "cogroup", "events"),
)
def udf_cogrouped_purchase_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map UDF surface (``groupBy().cogroup().applyInPandas``)
    — the third Arrow UDF kind after scalar pandas_udf and grouped
    applyInPandas: per user, the purchase group and the click group
    arrive TOGETHER as two pandas frames, here computing post-purchase
    click attribution. The stats are SQL-expressible (the oracle is
    the join form) — the point is exact-checked plumbing for two-sided
    per-key logic that built-ins can't express (per-key sequence
    alignment, custom as-of matching, per-entity model scoring against
    a reference series).

    Scale shape: one hash exchange per side on user_id (the cogroup
    key), then Arrow-batched per-key frames; nothing is collected, and
    group size bounds memory exactly like any grouped-map UDF. The
    filters push to the scan so each side ships only its event type.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    side = lambda tp: ev.filter(F.col("event_type") == tp).select(  # noqa: E731
        "user_id", epoch_us("ts").alias("us")
    )
    return (
        side("purchase")
        .groupBy("user_id")
        .cogroup(side("click").groupBy("user_id"))
        .applyInPandas(_purchase_click_stats, schema=_COGROUP_SCHEMA)
        .orderBy("user_id")
    )


# Wilson lower confidence bound at z = 1.96 (95%), shared verbatim
# between Spark SQL and DuckDB. Every literal is cast to DOUBLE before
# touching the expression: bare decimal literals are DECIMAL in DuckDB
# and decimal division rounds differently from IEEE. With doubles only,
# +, *, /, sqrt are all correctly-rounded IEEE ops, so both engines
# produce bit-identical bounds with no fixed-point scaffolding needed
# until the final floor.
_WILSON = (
    "((CAST(r AS DOUBLE)/n + CAST(3.8416 AS DOUBLE)/(2*n))"
    " - CAST(1.96 AS DOUBLE)*sqrt((CAST(r AS DOUBLE)/n"
    "*(CAST(1 AS DOUBLE)-CAST(r AS DOUBLE)/n)"
    " + CAST(3.8416 AS DOUBLE)/(4*n))/n))"
    " / (CAST(1 AS DOUBLE)+CAST(3.8416 AS DOUBLE)/n)"
)


@register(
    "supplier_return_rate_wilson",
    oracle=f"""
        WITH s AS (
            SELECT l_suppkey, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
            FROM lineitem GROUP BY l_suppkey
        ),
        w AS (SELECT l_suppkey, n, r, {_WILSON} AS wl FROM s)
        SELECT l_suppkey, n, r,
               CAST(FLOOR(wl * 10000000) AS BIGINT) AS wilson_lo7
        FROM w ORDER BY wl DESC, l_suppkey LIMIT 20
    """,
    tags=("relational", "agg", "statistics"),
)
def supplier_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers ranked by the Wilson lower confidence bound of their
    return rate — the correct way to rank proportions when group sizes
    differ (a 3/3 supplier must not outrank a 95/100 one; the raw rate
    says it does, the lower bound says otherwise). The same estimator
    that backs 'sort by best rating' ranking.

    Cross-engine exactness: the bound is +, *, /, sqrt over doubles —
    all correctly-rounded IEEE operations — with every literal cast to
    DOUBLE first (DuckDB parses bare decimals as DECIMAL, whose
    division rounds differently). The identical expression string runs
    in both engines, so even the ORDER BY on the raw double agrees.

    Scale shape: one map-side-combined groupBy collapses the fact
    table to |suppliers| rows; the bound and the top-20 run on that.
    """
    li = widen(load_table(spark, sf_dir, "lineitem"))
    s = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("r"),
    )
    w = s.withColumn("wl", F.expr(_WILSON))
    return (
        w.orderBy(F.desc("wl"), "l_suppkey")
        .limit(20)
        .select(
            "l_suppkey",
            "n",
            "r",
            F.floor(F.col("wl") * 10000000).alias("wilson_lo7"),
        )
    )


def _pctl_cont(p: str, alias: str) -> str:
    """Shared Spark-SQL/DuckDB aggregate expression: linear-interpolated
    percentile from (value v, row_number rn, group size n) rows —
    PERCENTILE_CONT semantics spelled out so both engines execute the
    identical double arithmetic. target = (n-1)*p; lo/hi bracket it;
    result = lo + (hi-lo)*frac, fixed-pointed for hashing. The CASE
    probes compare against the row-level window count n (aggregates
    can't nest); the frac term re-derives the same target from MAX(n)
    after aggregation — identical value, legal placement."""
    tr = f"((n-1) * CAST({p} AS DOUBLE))"
    ta = f"((MAX(n)-1) * CAST({p} AS DOUBLE))"
    lo = f"MAX(CASE WHEN rn = CAST(FLOOR({tr}) AS BIGINT)+1 THEN v END)"
    hi = f"COALESCE(MAX(CASE WHEN rn = CAST(FLOOR({tr}) AS BIGINT)+2 THEN v END), {lo})"
    return (
        f"CAST(FLOOR(({lo} + ({hi} - {lo}) * ({ta} - FLOOR({ta}))) * 10000000)"
        f" AS BIGINT) AS {alias}"
    )


@register(
    "agg_percentile_cont_manual",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, value AS v,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
               {_pctl_cont('0.5', 'p50_7')},
               {_pctl_cont('0.9', 'p90_7')}
        FROM ranked GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "statistics", "percentile"),
)
def agg_percentile_cont_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_CONT(0.5 / 0.9) with linear interpolation, spelled
    out as rank arithmetic instead of the built-in aggregate: engines
    disagree in the last ulp of their native interpolating percentiles
    (different lo+frac*(hi-lo) vs (1-frac)*lo+frac*hi formulations),
    so the engine runs ONE explicit formulation in both. Companion to
    ``agg_percentile_disc_battery`` (discrete) and ``agg_approx``
    (sketched): this is the exact-interpolated point of the triangle.

    Scale shape: one exchange on event_type feeds both the row_number
    and count windows and the final aggregate (same partition key
    throughout — AQE chains them without re-exchanging). The
    MAX(CASE rn = k) probes mean no self-join back for the bracketing
    rows. Bounded key domains only; raw-stream percentiles at 100 TB
    belong to the sketched variant.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    wo = Window.partitionBy("event_type").orderBy("value", "event_id")
    wp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        F.col("value").alias("v"),
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.expr(_pctl_cont("0.5", "p50_7")),
            F.expr(_pctl_cont("0.9", "p90_7")),
        )
        .orderBy("event_type")
    )


@register(
    "scalar_try_error_handling",
    oracle="""
        WITH t AS (
            SELECT
                CASE WHEN CAST(FLOOR(value) AS BIGINT) % 3 = 0 THEN NULL
                     ELSE value / (CAST(FLOOR(value) AS BIGINT) % 3) END AS div_v,
                TRY_CAST(CASE WHEN event_id % 2 = 0
                              THEN CAST(event_id AS VARCHAR)
                              ELSE event_type END AS BIGINT) AS cast_v,
                string_split(props, ',')[3] AS elem_v,
                CASE WHEN event_id > 7 THEN NULL
                     ELSE 9223372036854775800 + event_id END AS add_v
            FROM events
        )
        SELECT COUNT(*) AS n_rows,
               COUNT(div_v) AS n_div_ok,
               CAST(SUM(CAST(FLOOR(div_v * 10000) AS BIGINT)) AS DOUBLE) / 10000
                   AS div_sum,
               COUNT(cast_v) AS n_cast_ok,
               CAST(SUM(cast_v) AS BIGINT) AS cast_sum,
               COUNT(elem_v) AS n_elem_ok,
               COUNT(add_v) AS n_add_ok,
               MIN(add_v) AS add_min
        FROM t
    """,
    tags=("scalar", "error-handling"),
)
def scalar_try_error_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-handling battery: the ``try_*`` function family
    (try_divide on zero denominators, Column.try_cast on mixed
    numeric/word strings, try_element_at past the end of an array,
    try_add at BIGINT overflow) — the engine's null-on-failure policy
    (SURVEY.md §7 hard-part d: the reference crashes on the first
    malformed payload, Streamer.java:328 Integer.parseInt; this engine
    never fails a job on one bad record). The oracle mirrors each
    try-op with its explicit guarded form (CASE/TRY_CAST/list OOB), so
    the NULL surface — not just the happy path — is value-hash-checked
    cross-engine.

    Scale shape: a single projection + global aggregate; every try-op
    stays inside whole-stage codegen (no exception-driven control
    flow — Spark compiles try_* to guarded expressions, which is why
    this costs nothing vs the unguarded forms).
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    denom = (F.floor("value").cast("long") % 3).cast("long")
    t = ev.select(
        F.try_divide(F.col("value"), denom).alias("div_v"),
        F.when(F.col("event_id") % 2 == 0, F.col("event_id").cast("string"))
        .otherwise(F.col("event_type"))
        .try_cast("long")
        .alias("cast_v"),
        F.try_element_at(F.split("props", ","), F.lit(3)).alias("elem_v"),
        F.try_add(F.lit(9223372036854775800), F.col("event_id")).alias("add_v"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("div_v").alias("n_div_ok"),
        (F.sum(F.floor(F.col("div_v") * 10000).cast("long")).cast("double") / 10000)
        .alias("div_sum"),
        F.count("cast_v").alias("n_cast_ok"),
        F.sum("cast_v").cast("long").alias("cast_sum"),
        F.count("elem_v").alias("n_elem_ok"),
        F.count("add_v").alias("n_add_ok"),
        F.min("add_v").alias("add_min"),
    )


WAU_DAYS = 7


def wau_from_day_user(day_user: DataFrame) -> DataFrame:
    """(d date, user_id) pairs → per-day trailing-7-day distinct-user
    counts. Shared by the batch query below and its streaming twin
    (streaming/sketches.sliding_distinct_pairs): the streaming side
    materializes the distinct pairs statefully, then this exact
    aggregation runs on the emitted pairs — the stream==batch parity
    test (tests/test_streaming_wau.py) leans on both paths calling
    this one function. Tolerates duplicate pairs (the streaming side
    may re-emit a pruned day): countDistinct collapses them."""
    observed = day_user.select("d").distinct().withColumnRenamed("d", "day_d")
    exploded = day_user.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(WAU_DAYS - 1)),
                lambda i: F.date_add(F.col("d"), i.cast("int")),
            )
        ).alias("wend"),
        "user_id",
    )
    return (
        exploded.join(
            F.broadcast(observed), exploded["wend"] == observed["day_d"], "left_semi"
        )
        .groupBy("wend")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.date_format("wend", "yyyy-MM-dd").alias("day"), "wau")
        .orderBy("day")
    )


@register(
    "events_wau_sliding",
    oracle=f"""
        WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
        SELECT strftime(d, '%Y-%m-%d') AS day,
               COUNT(DISTINCT user_id) AS wau
        FROM days JOIN events
          ON CAST(ts AS DATE) BETWEEN d - INTERVAL {WAU_DAYS - 1} DAY AND d
        GROUP BY d
        ORDER BY day
    """,
    tags=("agg", "window-time", "distinct"),
)
def events_wau_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day (WAU) — the sliding
    COUNT(DISTINCT) no window function can compute, because distinct
    counts don't merge across frames. The oracle's range join touches
    each event once per window it falls in; Spark gets the same cost
    shape without a join: reduce events to DISTINCT (day, user) pairs
    first, then explode each pair into the ≤7 window-end days it
    contributes to and groupBy-countDistinct.

    Scale shape: the first distinct collapses raw events to at most
    |days| x |users| compact pairs (map-side partial), the 7x fan-out
    multiplies only those pairs, and the final countDistinct is again
    two-phase. A broadcast semi-join against the (tiny) observed-day
    list trims windows that end on event-free days, mirroring the
    oracle's days CTE. At 100 TB nothing ever shuffles event bodies —
    only (date, user_id) pairs.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    day_user = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    return wau_from_day_user(day_user)
