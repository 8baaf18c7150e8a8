"""Round-6 batch 222: recursive CTE surface (Spark 4 ``WITH RECURSIVE``).

The reference engine's only iteration construct is its per-record
consume→compute→produce loop (Streamer.java:300-360); it has no
relational recursion at all. This batch closes the last SQL-surface
gap in the engine's shared dialect: linear recursion (running state
along an ordered chain), generator recursion (a spine of values that
exists in no base table), and hierarchical recursion (transitive
closure over a DAG) — all as single ANSI strings executed VERBATIM by
both engines, extending the sql_text_shared_dialect_* family
(relational13.py).

Dialect constraints pinned by these entries (and why each query is
shaped the way it is):

- Spark 4.1 recursive CTEs accept **UNION ALL only**
  (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so every recursion here is
  a depth-bounded DAG walk that provably generates no duplicates —
  never a fixed-point closure that relies on UNION-distinct to
  terminate on cycles.
- Spark's default recursion ceiling is 100 levels and the escape
  hatch (``MAX RECURSION LEVEL n``) is Spark-only syntax DuckDB will
  not parse, so each recursion's depth is bounded by a data invariant
  measured at every fixture SF: calendar months in the orders range
  (80), max orders per customer (24 at sf0.1), and heap-tree depth
  log2(max p_partkey) (~14 at sf0.1, ~24 even at 20M parts).
- Integer ``/`` + CAST is NOT in the dialect intersection (DuckDB
  casts 1998.75 → 1999 by rounding, Spark truncates to 1998), so all
  quotient math goes through explicit floor() — same trap class the
  epoch_us helper pins for date arithmetic.

Determinism discipline as everywhere else: money is per-row
``floor(price*100)`` cents summed as BIGINT (order-independent exact
integer addition — the recursion's accumulation order differs between
engines by construction), counts/depths/keys stay BIGINT end-to-end.

Scale posture: a recursive CTE executes as one join per level, each a
normal shuffle-partitioned equi-join Catalyst plans like any other —
per-customer chains join on o_custkey (hash-distributed, no
single-partition state), and the BOM explosion fans out map-side from
a broadcast-small frontier. Depth, not data volume, is the iteration
count, and depth is O(log n) or O(orders-per-key) — both essentially
flat as the corpus scales 1000x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.registry import register
from kafkastreamer_spark.sql import run_sql

# Generator recursion: a month spine from min to max order month —
# rows that exist in no base table — then a gap-filled revenue series.
# The spine carries its own stop bound (hi) as a column: the recursive
# step is pure row arithmetic, no correlated subquery (not in the
# recursive-step dialect intersection).
_RECURSIVE_MONTH_SPINE = """
    WITH RECURSIVE bounds AS (
        SELECT CAST(min(extract(year FROM o_orderdate) * 12
                        + extract(month FROM o_orderdate)) AS BIGINT) AS lo,
               CAST(max(extract(year FROM o_orderdate) * 12
                        + extract(month FROM o_orderdate)) AS BIGINT) AS hi
        FROM orders
    ),
    spine(m, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT m + 1, hi FROM spine WHERE m < hi
    ),
    monthly AS (
        SELECT CAST(extract(year FROM o_orderdate) * 12
                    + extract(month FROM o_orderdate) AS BIGINT) AS m,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM orders GROUP BY 1
    )
    SELECT CAST(floor((s.m - 1) / 12.0) AS BIGINT) AS yr,
           CAST((s.m - 1) % 12 + 1 AS BIGINT) AS mo,
           COALESCE(mo2.n_orders, CAST(0 AS BIGINT)) AS n_orders,
           COALESCE(mo2.revenue_cents, CAST(0 AS BIGINT)) AS revenue_cents
    FROM spine s LEFT JOIN monthly mo2 ON mo2.m = s.m
    ORDER BY yr, mo
"""


@register(
    "sql_text_recursive_month_spine",
    oracle=_RECURSIVE_MONTH_SPINE,
    tags=("sql-surface", "recursive", "orders"),
)
def sql_text_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive month-spine generation + gap-filled monthly revenue,
    one shared-dialect string run verbatim by both engines.

    The spine rows come from recursion, not from any table — the
    canonical "calendar dimension without a calendar table" pattern a
    reporting user of the reference would otherwise need a side file
    for. Missing months surface as explicit zero rows (LEFT JOIN +
    COALESCE), which a plain GROUP BY can never produce.

    Depth = number of months in the orders date range (80 at every
    fixture SF; TPC-H's 7-year window is SF-invariant). The monthly
    aggregate itself is an ordinary map-side-combined groupBy; the
    spine is ~80 rows and broadcasts into the final join.
    """
    return run_sql(spark, sf_dir, _RECURSIVE_MONTH_SPINE)


# Linear recursion: running state along each customer's order chain.
# rn comes from a window (deterministic tie-break on o_orderkey); the
# recursion then walks rn -> rn+1 per key. Cents accumulate as exact
# BIGINTs so the engines' different accumulation orders cannot split
# the hash.
_RECURSIVE_CUSTOMER_CHAIN = """
    WITH RECURSIVE ranked AS (
        SELECT o_custkey, o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
        FROM orders
        WHERE o_custkey % 10 = 0
    ),
    walk(o_custkey, rn, cum_cents) AS (
        SELECT o_custkey, rn, price_cents FROM ranked WHERE rn = 1
        UNION ALL
        SELECT r.o_custkey, r.rn, w.cum_cents + r.price_cents
        FROM walk w JOIN ranked r
          ON r.o_custkey = w.o_custkey AND r.rn = w.rn + 1
    )
    SELECT o_custkey, CAST(max(rn) AS BIGINT) AS chain_len,
           CAST(max(cum_cents) AS BIGINT) AS total_cents
    FROM walk GROUP BY o_custkey ORDER BY o_custkey
"""


@register(
    "sql_text_recursive_customer_chain",
    oracle=_RECURSIVE_CUSTOMER_CHAIN,
    tags=("sql-surface", "recursive", "orders"),
)
def sql_text_recursive_customer_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear recursion: walk each customer's orders in date order
    carrying a running total, then report chain length and final
    cumulative spend per customer — the recursive formulation of a
    running-sum window, pinned against the same engine pair.

    The walk is the reference's own mental model made relational: its
    stages carry per-key running state record-by-record in arrival
    order (Streamer.java:443-466, per-key FIFO README.md:2-4); here
    the "arrival order" is the rn chain and the state is cum_cents.

    Depth = max orders per customer (24 at sf0.1 — an SF-invariant
    TPC-H property, orders-per-customer does not grow with volume).
    Every recursion level is a hash join on (o_custkey, rn): key-
    distributed, no driver state, frontier shrinks as short chains
    exhaust. The %10 slice keeps the fixture output compact without
    changing the machinery.
    """
    return run_sql(spark, sf_dir, _RECURSIVE_CUSTOMER_CHAIN)


# Hierarchical recursion: transitive closure over a synthetic-but-
# deterministic part DAG — partkeys are dense 0..mk, so the implicit
# binary heap (children 2k+1, 2k+2) is a real DAG over real rows with
# a closed-form closure size the tests verify independently. Children
# strictly exceed parents, so UNION ALL generates each node exactly
# once per root (no cycles, no duplicates).
_RECURSIVE_BOM_CLOSURE = """
    WITH RECURSIVE maxk AS (
        SELECT CAST(max(p_partkey) AS BIGINT) AS mk FROM part
    ),
    walk(root, node, depth, mk) AS (
        SELECT p_partkey, p_partkey, CAST(0 AS BIGINT), mk
        FROM part CROSS JOIN maxk WHERE p_partkey < 8
        UNION ALL
        SELECT w.root, w.node * 2 + d.o, w.depth + 1, w.mk
        FROM walk w CROSS JOIN (VALUES (CAST(1 AS BIGINT)),
                                       (CAST(2 AS BIGINT))) AS d(o)
        WHERE w.node * 2 + d.o <= w.mk
    )
    SELECT root, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(max(depth) AS BIGINT) AS max_depth,
           CAST(sum(node) AS BIGINT) AS sum_keys
    FROM walk GROUP BY root ORDER BY root
"""


@register(
    "sql_text_recursive_bom_closure",
    oracle=_RECURSIVE_BOM_CLOSURE,
    tags=("sql-surface", "recursive", "part"),
)
def sql_text_recursive_bom_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical recursion: bill-of-materials-style transitive
    closure — explode each root part's full component subtree and
    report descendant count, depth, and a key checksum per root.

    The component edge is the dense-key heap relation (children
    2k+1/2k+2, bounded by max p_partkey), chosen because it is (a)
    derived entirely from fixture data, (b) cycle-free by strict
    monotonicity — the only recursion shape Spark's UNION-ALL-only
    recursive CTE can run safely — and (c) closed-form checkable
    (subtree sizes of a complete binary heap), which the pytest
    invariants exploit.

    Depth = floor(log2(mk)) (~14 at sf0.1, ~24 at 20M parts): the
    frontier doubles per level but every level is a map-side
    projection of the previous one (the VALUES fan-out broadcasts),
    so the closure is embarrassingly parallel; the only shuffle is
    the final per-root aggregate.
    """
    return run_sql(spark, sf_dir, _RECURSIVE_BOM_CLOSURE)


# ---------------------------------------------------------------------------
# Batch 223: time-series similarity search over behavioral series
# (PAPERS.md: "Time Series Similarity Search for Streaming Data in
# Distributed Systems", EDBT 2019; "REPOSE: Distributed Top-k
# Trajectory Similarity Search", ICDE 2021 — the blocking-tree idea
# appears here as SAX-word blocking).
#
# Series model: each user's zero-filled daily event-count vector over
# the global 30-day domain, kept SPARSE (only active days stored) —
# zero days contribute nothing to any co-moment, so Pearson over the
# dense vectors is computed exactly from sparse rows:
#   r = (nd*Sxy - Sx*Sy) / sqrt((nd*Sxx - Sx^2) * (nd*Syy - Sy^2))
# with every S* an exact BIGINT and nd the global day count. The only
# doubles are one division and one sqrt on integer-derived operands,
# expression-mirrored between engines (same discipline as
# similarity_topk_bruteforce's cosine and the covar_corr co-moments).
# ---------------------------------------------------------------------------

from kafkastreamer_spark.queries._util import epoch_us
from kafkastreamer_spark.tables import load_table

TS_SEED_USERS = 3  # user_id < 3: fixed seed set, SF-invariant
TS_TOP_K = 5
TS_PAIR_R_MIN = 0.30  # blocked-pair acceptance threshold
TS_SNM_WINDOW = 8  # sorted-neighborhood width inside a SAX block
TS_SEG_DAYS = 10  # SAX segment length (3 segments over the 30-day domain)

# Shared SQL fragments (DuckDB oracle side; epoch_us is native there).
_SQL_DAILY = """
    daily AS (
        SELECT user_id,
               CAST(floor(epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP))
                          / 86400000000.0) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    )
"""
_SQL_DOM = """
    dom AS (
        SELECT CAST(count(DISTINCT d) AS BIGINT) AS nd,
               min(d) AS dmin, max(d) AS dmax
        FROM daily
    )
"""
_SQL_MOMENTS = """
    m AS (
        SELECT user_id, CAST(sum(c) AS BIGINT) AS sx,
               CAST(sum(c * c) AS BIGINT) AS sxx
        FROM daily GROUP BY 1
    )
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse per-user daily count series (only active days stored)."""
    ev = load_table(spark, sf_dir, "events")
    d = F.floor(
        epoch_us(F.to_date("ts").cast("timestamp")) / 86400000000.0
    ).cast("long")
    return ev.groupBy("user_id", d.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def _dom(daily: DataFrame) -> DataFrame:
    return daily.agg(
        F.countDistinct("d").cast("long").alias("nd"),
        F.min("d").alias("dmin"),
        F.max("d").alias("dmax"),
    )


def _moments(daily: DataFrame) -> DataFrame:
    return daily.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sxx"),
    )


def _pearson(nd, sxy, sx_a, sxx_a, sx_b, sxx_b):
    """Expression-mirrored Pearson from exact integer co-moments —
    num/den order matches the oracle text token for token so the
    doubles are bit-identical across engines."""
    num = nd * sxy - sx_a * sx_b
    dx = nd * sxx_a - sx_a * sx_a
    dy = nd * sxx_b - sx_b * sx_b
    return num / F.sqrt((dx * dy).cast("double")), dx, dy


@register(
    "ts_similarity_search_seed",
    oracle=f"""
        WITH {_SQL_DAILY}, {_SQL_DOM}, {_SQL_MOMENTS},
        xy AS (
            SELECT a.user_id AS seed_id, b.user_id AS neighbor_id,
                   CAST(sum(a.c * b.c) AS BIGINT) AS sxy
            FROM daily a JOIN daily b
              ON a.d = b.d AND a.user_id < {TS_SEED_USERS}
             AND b.user_id != a.user_id
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT seed_id, neighbor_id,
                   (nd * sxy - ma.sx * mb.sx)
                   / sqrt(CAST((nd * ma.sxx - ma.sx * ma.sx)
                               * (nd * mb.sxx - mb.sx * mb.sx) AS DOUBLE)) AS r
            FROM xy
            JOIN m ma ON ma.user_id = seed_id
            JOIN m mb ON mb.user_id = neighbor_id
            CROSS JOIN dom
            WHERE (nd * ma.sxx - ma.sx * ma.sx) > 0
              AND (nd * mb.sxx - mb.sx * mb.sx) > 0
        ),
        ranked AS (
            SELECT seed_id, neighbor_id,
                   CAST(FLOOR(r * 10000) AS BIGINT) AS r4,
                   ROW_NUMBER() OVER (PARTITION BY seed_id
                                      ORDER BY r DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT seed_id, neighbor_id, r4, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= {TS_TOP_K}
        ORDER BY seed_id, rank
    """,
    tags=("llm-data", "timeseries", "similarity"),
)
def ts_similarity_search_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k time-series similarity search: for each seed user,
    the TS_TOP_K users whose daily-activity series correlates highest
    (Pearson over the zero-filled 30-day domain, computed exactly from
    the sparse rows — zero days drop out of every co-moment).

    The behavioral analog of similarity_topk_bruteforce: seed side is
    tiny and broadcasts; the Sxy join is keyed on the day column, so
    candidates are (seed x active-day) — linear in corpus size with a
    fixed seed set. Constant-series users (zero variance) are excluded
    in both engines; pairs sharing no active day never materialize a
    co-moment row on either engine (documented: at ~90% daily activity
    every real pair shares days).

    The final computation is shared with the streaming twin
    (streaming/ts_similarity.py), which maintains the same (user, day,
    count) base incrementally via the keyed upsert sink and must
    reproduce this entry bit-for-bit
    (tests/test_streaming_ts_similarity.py).
    """
    return seed_topk_from_daily(_daily(spark, sf_dir))


def seed_topk_from_daily(daily: DataFrame) -> DataFrame:
    """Seed top-k Pearson from the (user_id, d, c) daily-count base —
    the pure final computation, shared by the batch entry above and
    the streaming maintenance twin."""
    dom = _dom(daily)
    m = _moments(daily)
    a = daily.filter(F.col("user_id") < TS_SEED_USERS).select(
        F.col("user_id").alias("seed_id"), "d", F.col("c").alias("ca")
    )
    b = daily.select(
        F.col("user_id").alias("neighbor_id"), "d", F.col("c").alias("cb")
    )
    xy = (
        F.broadcast(a)
        .join(b, (a.d == b.d) & (F.col("neighbor_id") != F.col("seed_id")))
        .groupBy("seed_id", "neighbor_id")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("sxy"))
    )
    ma = m.select(
        F.col("user_id").alias("seed_id"),
        F.col("sx").alias("sx_a"),
        F.col("sxx").alias("sxx_a"),
    )
    mb = m.select(
        F.col("user_id").alias("neighbor_id"),
        F.col("sx").alias("sx_b"),
        F.col("sxx").alias("sxx_b"),
    )
    scored = xy.join(F.broadcast(ma), "seed_id").join(mb, "neighbor_id").join(
        F.broadcast(dom)
    )
    r, dx, dy = _pearson(
        F.col("nd"), F.col("sxy"), F.col("sx_a"), F.col("sxx_a"),
        F.col("sx_b"), F.col("sxx_b"),
    )
    w = Window.partitionBy("seed_id").orderBy(F.desc("r"), "neighbor_id")
    return (
        scored.filter((dx > 0) & (dy > 0))
        .withColumn("r", r)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TS_TOP_K)
        .select(
            "seed_id",
            "neighbor_id",
            F.floor(F.col("r") * 10000).cast("long").alias("r4"),
            "rank",
        )
        .orderBy("seed_id", "rank")
    )


TS_MOTIF_W = 7  # motif window length in days


@register(
    "ts_motif_discovery_daily",
    oracle=f"""
        WITH {_SQL_DAILY}, {_SQL_DOM},
        totals AS (
            SELECT d, CAST(sum(c) AS BIGINT) AS v FROM daily GROUP BY d
        ),
        q AS (
            SELECT d - (dmax - {TS_MOTIF_W - 1}) AS i, v
            FROM totals CROSS JOIN dom WHERE d >= dmax - {TS_MOTIF_W - 1}
        ),
        qm AS (
            SELECT CAST(sum(v) AS BIGINT) AS sq,
                   CAST(sum(v * v) AS BIGINT) AS sqq
            FROM q
        ),
        cand AS (
            SELECT w.d AS s, t.d - w.d AS i, t.v
            FROM totals w
            JOIN totals t ON t.d >= w.d AND t.d <= w.d + {TS_MOTIF_W - 1}
            CROSS JOIN dom
            WHERE w.d <= dmax - {TS_MOTIF_W}
        ),
        cm AS (
            SELECT s, CAST(count(*) AS BIGINT) AS n7,
                   CAST(sum(v) AS BIGINT) AS sv,
                   CAST(sum(v * v) AS BIGINT) AS svv
            FROM cand GROUP BY s
        ),
        vq AS (
            SELECT c.s, CAST(sum(c.v * q.v) AS BIGINT) AS svq
            FROM cand c JOIN q ON q.i = c.i GROUP BY c.s
        ),
        scored AS (
            SELECT s,
                   ({TS_MOTIF_W} * svq - sv * sq)
                   / sqrt(CAST(({TS_MOTIF_W} * svv - sv * sv)
                               * ({TS_MOTIF_W} * sqq - sq * sq) AS DOUBLE)) AS r
            FROM cm JOIN vq USING (s) CROSS JOIN qm
            WHERE n7 = {TS_MOTIF_W}
              AND ({TS_MOTIF_W} * svv - sv * sv) > 0
              AND ({TS_MOTIF_W} * sqq - sq * sq) > 0
        ),
        ranked AS (
            SELECT s, CAST(FLOOR(r * 10000) AS BIGINT) AS r4,
                   ROW_NUMBER() OVER (ORDER BY r DESC, s) AS rank
            FROM scored
        )
        SELECT CAST(s - dmin AS BIGINT) AS start_off, r4,
               CAST(rank AS BIGINT) AS rank
        FROM ranked CROSS JOIN dom
        WHERE rank <= {TS_TOP_K} ORDER BY rank
    """,
    tags=("llm-data", "timeseries", "similarity"),
)
def ts_motif_discovery_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsequence similarity search (matrix-profile-lite): which
    earlier 7-day window of the global daily-activity series best
    matches the LAST 7 days' shape? Pearson between each candidate
    window and the trailing-week query window, exact from integer
    window sums; top-5 starts by correlation.

    The series is the POST-AGGREGATION daily-total domain (30 rows at
    every SF — day count is volume-invariant), so the window
    enumeration join and the unpartitioned rank are domain-bounded,
    never base-table work: at 1000x events the only growing stage is
    the first map-side-combined groupBy. Query-window overlap with
    candidates is allowed; only the query window itself is excluded
    (s <= dmax - 7).
    """
    daily = _daily(spark, sf_dir)
    dom = _dom(daily)
    totals = daily.groupBy("d").agg(F.sum("c").cast("long").alias("v"))
    q = (
        totals.join(F.broadcast(dom))
        .filter(F.col("d") >= F.col("dmax") - (TS_MOTIF_W - 1))
        .select((F.col("d") - (F.col("dmax") - (TS_MOTIF_W - 1))).alias("i"), "v")
    )
    qm = q.agg(
        F.sum("v").cast("long").alias("sq"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("sqq"),
    )
    w_side = totals.select(F.col("d").alias("s"))
    cand = (
        w_side.join(
            totals,
            (F.col("d") >= F.col("s")) & (F.col("d") <= F.col("s") + (TS_MOTIF_W - 1)),
        )
        .join(F.broadcast(dom))
        .filter(F.col("s") <= F.col("dmax") - TS_MOTIF_W)
        .select("s", (F.col("d") - F.col("s")).alias("i"), "v")
    )
    cm = cand.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n7"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
    )
    vq = (
        cand.join(F.broadcast(q.withColumnRenamed("v", "qv")), "i")
        .groupBy("s")
        .agg(F.sum(F.col("v") * F.col("qv")).cast("long").alias("svq"))
    )
    W = TS_MOTIF_W
    scored = (
        cm.join(vq, "s")
        .join(F.broadcast(qm))
        .filter(
            (F.col("n7") == W)
            & (F.lit(W) * F.col("svv") - F.col("sv") * F.col("sv") > 0)
            & (F.lit(W) * F.col("sqq") - F.col("sq") * F.col("sq") > 0)
        )
        .withColumn(
            "r",
            (F.lit(W) * F.col("svq") - F.col("sv") * F.col("sq"))
            / F.sqrt(
                (
                    (F.lit(W) * F.col("svv") - F.col("sv") * F.col("sv"))
                    * (F.lit(W) * F.col("sqq") - F.col("sq") * F.col("sq"))
                ).cast("double")
            ),
        )
    )
    wnd = Window.orderBy(F.desc("r"), "s")
    return (
        scored.withColumn("rank", F.row_number().over(wnd).cast("long"))
        .filter(F.col("rank") <= TS_TOP_K)
        .join(F.broadcast(dom.select("dmin")))
        .select(
            (F.col("s") - F.col("dmin")).cast("long").alias("start_off"),
            F.floor(F.col("r") * 10000).cast("long").alias("r4"),
            "rank",
        )
        .orderBy("rank")
    )


# SAX-lite symbolization shared by the block inventory and the blocked
# pair search: 3 ten-day segments, binary alphabet per segment —
# '1' iff the segment's event sum exceeds the user's per-segment mean,
# decided by integer cross-multiplication (3*segsum > sx), '_' for a
# segment with no active days. Everything integer until the final
# Pearson verify.
_SQL_WORD = """
    seg AS (
        SELECT user_id,
               CAST(floor((d - dmin) / 10.0) AS BIGINT) AS s,
               CAST(sum(c) AS BIGINT) AS segsum
        FROM daily CROSS JOIN dom GROUP BY 1, 2
    ),
    segbits AS (
        SELECT seg.user_id, s,
               CASE WHEN 3 * segsum > m.sx THEN '1' ELSE '0' END AS b
        FROM seg JOIN m ON m.user_id = seg.user_id
    ),
    word AS (
        SELECT user_id,
               concat(coalesce(max(CASE WHEN s = 0 THEN b END), '_'),
                      coalesce(max(CASE WHEN s = 1 THEN b END), '_'),
                      coalesce(max(CASE WHEN s = 2 THEN b END), '_')) AS w
        FROM segbits GROUP BY user_id
    )
"""


def _word(daily: DataFrame, dom: DataFrame, m: DataFrame) -> DataFrame:
    seg = (
        daily.join(F.broadcast(dom.select("dmin")))
        .groupBy(
            "user_id",
            F.floor((F.col("d") - F.col("dmin")) / 10.0).cast("long").alias("s"),
        )
        .agg(F.sum("c").cast("long").alias("segsum"))
    )
    segbits = seg.join(m, "user_id").select(
        "user_id",
        "s",
        F.when(F.lit(3) * F.col("segsum") > F.col("sx"), "1")
        .otherwise("0")
        .alias("b"),
    )
    return segbits.groupBy("user_id").agg(
        F.concat(
            *[
                F.coalesce(
                    F.max(F.when(F.col("s") == i, F.col("b"))), F.lit("_")
                )
                for i in range(3)
            ]
        ).alias("w")
    )


@register(
    "ts_sax_symbolic_blocks",
    oracle=f"""
        WITH {_SQL_DAILY}, {_SQL_DOM}, {_SQL_MOMENTS}, {_SQL_WORD}
        SELECT w AS sax_word, CAST(count(*) AS BIGINT) AS n_users,
               CAST(min(word.user_id) AS BIGINT) AS rep_user,
               CAST(sum(m.sx) AS BIGINT) AS total_events
        FROM word JOIN m ON m.user_id = word.user_id
        GROUP BY w ORDER BY w
    """,
    tags=("llm-data", "timeseries", "similarity"),
)
def ts_sax_symbolic_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-lite symbolic indexing of the per-user activity series: the
    block inventory (word -> population) that makes wholesale series
    similarity search tractable — REPOSE's reference-point-trie idea
    collapsed to one shuffle, with the symbol decided by exact integer
    cross-multiplication instead of z-scored doubles.

    Scale: two keyed aggregates (user x segment, then user) and a
    word-keyed count; at 1000x users every stage stays key-distributed
    with map-side combine, and the block alphabet (3^3 = 27 fixed
    words over symbols {0, 1, _})
    bounds the output domain.
    """
    daily = _daily(spark, sf_dir)
    dom = _dom(daily)
    m = _moments(daily)
    w = _word(daily, dom, m)
    return (
        w.join(m, "user_id")
        .groupBy(F.col("w").alias("sax_word"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.min("user_id").cast("long").alias("rep_user"),
            F.sum("sx").cast("long").alias("total_events"),
        )
        .orderBy("sax_word")
    )


@register(
    "ts_similarity_blocked_pairs",
    oracle=f"""
        WITH {_SQL_DAILY}, {_SQL_DOM}, {_SQL_MOMENTS}, {_SQL_WORD},
        rnw AS (
            SELECT word.user_id, w, sx,
                   ROW_NUMBER() OVER (PARTITION BY w
                                      ORDER BY sx DESC, word.user_id) AS rn
            FROM word JOIN m ON m.user_id = word.user_id
        ),
        cand AS (
            SELECT a.user_id AS ia, b.user_id AS ib, a.w AS sax_word
            FROM rnw a JOIN rnw b
              ON a.w = b.w AND b.rn > a.rn
             AND b.rn <= a.rn + {TS_SNM_WINDOW}
        ),
        xy AS (
            SELECT ia, ib, sax_word,
                   CAST(sum(da.c * db2.c) AS BIGINT) AS sxy
            FROM cand
            JOIN daily da ON da.user_id = ia
            JOIN daily db2 ON db2.user_id = ib AND db2.d = da.d
            GROUP BY 1, 2, 3
        ),
        scored AS (
            SELECT least(ia, ib) AS ua, greatest(ia, ib) AS ub, sax_word,
                   (nd * sxy - ma.sx * mb.sx)
                   / sqrt(CAST((nd * ma.sxx - ma.sx * ma.sx)
                               * (nd * mb.sxx - mb.sx * mb.sx) AS DOUBLE)) AS r
            FROM xy
            JOIN m ma ON ma.user_id = ia
            JOIN m mb ON mb.user_id = ib
            CROSS JOIN dom
            WHERE (nd * ma.sxx - ma.sx * ma.sx) > 0
              AND (nd * mb.sxx - mb.sx * mb.sx) > 0
        )
        SELECT ua, ub, sax_word, CAST(FLOOR(r * 10000) AS BIGINT) AS r4
        FROM scored WHERE r >= {TS_PAIR_R_MIN}
        ORDER BY ua, ub
    """,
    tags=("llm-data", "timeseries", "similarity"),
)
def ts_similarity_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wholesale series-pair similarity, SAX-blocked AND
    sorted-neighborhood-bounded: within each SAX word, users are
    ranked by total activity (sx DESC, id tie-break) and each user is
    compared only with the next TS_SNM_WINDOW users in that order —
    the classic sorted-neighborhood blocking of entity resolution
    (Hernandez & Stolfo, SIGMOD 1995) layered on the SAX block, then
    exact Pearson verification keeps pairs with r >= 0.30.

    Round-7 rework (VERDICT r6 "What's wrong #2"): the previous form
    compared ALL pairs inside a block, so a fixed threshold on
    noise-like series kept a constant fraction of n^2 pairs — output
    and cost both quadratic (18.4x at 4x data, docs/SCALING.md). The
    SNM window caps candidates at n x W, making cost AND output
    linear in users while keeping the recall/volume trade explicit
    (like every LSH-family entry, misses are pairs far apart in the
    activity ordering; ts_similarity_search_seed remains the
    exact-per-seed form).

    Scale: the per-word rank uses the deskewed two-phase
    bucketed_row_number (operators/deskew.py) — the SAX alphabet is
    fixed (27 words), so a plain window would sort n/27 rows in one
    task; candidate generation is a pure equi-join (the window offsets
    are EXPLODEd map-side into (word, rn) keys, never a non-equi range
    join); the per-pair co-moment is two daily equi-joins bounded by
    nd days. Every stage is key-distributed and linear in users.
    """
    from kafkastreamer_spark.operators.deskew import (  # noqa: PLC0415
        bucketed_row_number,
    )

    daily = _daily(spark, sf_dir)
    dom = _dom(daily)
    m = _moments(daily)
    w = _word(daily, dom, m)
    rnw = bucketed_row_number(
        w.join(m.select("user_id", "sx"), "user_id"),
        ["w"],
        F.floor(F.col("sx") / 16).cast("long"),
        [F.col("sx").desc(), F.col("user_id").asc()],
        "rn",
        bucket_desc=True,
    )
    a = rnw.select(
        F.col("user_id").alias("ia"), F.col("w").alias("sax_word"), "rn"
    ).withColumn(
        "rn_b",
        F.explode(F.sequence(F.col("rn") + 1, F.col("rn") + TS_SNM_WINDOW)),
    )
    b = rnw.select(
        F.col("user_id").alias("ib"),
        F.col("w").alias("wb"),
        F.col("rn").alias("rn2"),
    )
    cand = a.join(
        b, (F.col("sax_word") == F.col("wb")) & (F.col("rn_b") == F.col("rn2"))
    ).select("ia", "ib", "sax_word")
    da = daily.select(F.col("user_id").alias("ia"), "d", F.col("c").alias("ca"))
    db2 = daily.select(F.col("user_id").alias("ib"), "d", F.col("c").alias("cb"))
    xy = (
        cand.join(da, "ia")
        .join(db2, ["ib", "d"])
        .groupBy("ia", "ib", "sax_word")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("sxy"))
    )
    ma = m.select(
        F.col("user_id").alias("ia"),
        F.col("sx").alias("sx_a"),
        F.col("sxx").alias("sxx_a"),
    )
    mb = m.select(
        F.col("user_id").alias("ib"),
        F.col("sx").alias("sx_b"),
        F.col("sxx").alias("sxx_b"),
    )
    scored = xy.join(ma, "ia").join(mb, "ib").join(F.broadcast(dom))
    r, dx, dy = _pearson(
        F.col("nd"), F.col("sxy"), F.col("sx_a"), F.col("sxx_a"),
        F.col("sx_b"), F.col("sxx_b"),
    )
    return (
        scored.filter((dx > 0) & (dy > 0))
        .withColumn("r", r)
        .filter(F.col("r") >= TS_PAIR_R_MIN)
        .select(
            F.least("ia", "ib").alias("ua"),
            F.greatest("ia", "ib").alias("ub"),
            "sax_word",
            F.floor(F.col("r") * 10000).cast("long").alias("r4"),
        )
        .orderBy("ua", "ub")
    )


@register(
    "ts_trajectory_ngram_similarity",
    oracle=f"""
        WITH seqs AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        ),
        bigrams AS (
            SELECT DISTINCT user_id, concat(prev, '>', event_type) AS bg
            FROM seqs WHERE prev IS NOT NULL
        ),
        sizes AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM bigrams GROUP BY 1
        ),
        inter AS (
            SELECT a.user_id AS seed_id, b.user_id AS neighbor_id,
                   CAST(count(*) AS BIGINT) AS ninter
            FROM bigrams a JOIN bigrams b
              ON a.bg = b.bg AND a.user_id < {TS_SEED_USERS}
             AND b.user_id != a.user_id
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT seed_id, neighbor_id,
                   (ninter * 10000) // (sa.n + sb.n - ninter) AS jac4
            FROM inter
            JOIN sizes sa ON sa.user_id = seed_id
            JOIN sizes sb ON sb.user_id = neighbor_id
        ),
        ranked AS (
            SELECT seed_id, neighbor_id, CAST(jac4 AS BIGINT) AS jac4,
                   ROW_NUMBER() OVER (PARTITION BY seed_id
                                      ORDER BY jac4 DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT seed_id, neighbor_id, jac4, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= {TS_TOP_K}
        ORDER BY seed_id, rank
    """,
    tags=("llm-data", "timeseries", "similarity"),
)
def ts_trajectory_ngram_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory similarity search (REPOSE's problem, ICDE 2021, in
    k-mer form): rank users by ORDER-AWARE similarity of their event
    paths — Jaccard over distinct event-type bigrams of the (ts,
    event_id)-ordered per-user sequence — which daily-count
    correlation (ts_similarity_search_seed) is blind to.

    Fully integer: bigram sets via one LAG window, intersection via
    the inverted bigram join (seed side broadcast-small), Jaccard as
    exact fixed-point integer division (positive operands, floor ==
    truncate in both engines — never a rounded double quotient).

    Scale: the bigram vocabulary is event_type² (fixed domain), so
    the seed-side join is a broadcast against a linear posting list;
    per-user sequence work is one key-partitioned window.
    """
    ev = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bigrams = (
        ev.select(
            "user_id",
            F.concat(
                F.lag("event_type").over(wseq), F.lit(">"), F.col("event_type")
            ).alias("bg"),
        )
        .filter(F.col("bg").isNotNull())
        .distinct()
    )
    sizes = bigrams.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = bigrams.filter(F.col("user_id") < TS_SEED_USERS).select(
        F.col("user_id").alias("seed_id"), "bg"
    )
    b = bigrams.select(F.col("user_id").alias("neighbor_id"), "bg")
    inter = (
        F.broadcast(a)
        .join(b, (a.bg == b.bg) & (F.col("neighbor_id") != F.col("seed_id")))
        .groupBy("seed_id", "neighbor_id")
        .agg(F.count(F.lit(1)).cast("long").alias("ninter"))
    )
    sa = sizes.select(F.col("user_id").alias("seed_id"), F.col("n").alias("na"))
    sb = sizes.select(
        F.col("user_id").alias("neighbor_id"), F.col("n").alias("nb")
    )
    scored = (
        inter.join(F.broadcast(sa), "seed_id")
        .join(sb, "neighbor_id")
        .withColumn(
            "jac4",
            F.expr("(ninter * 10000) div (na + nb - ninter)").cast("long"),
        )
    )
    wr = Window.partitionBy("seed_id").orderBy(F.desc("jac4"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= TS_TOP_K)
        .select("seed_id", "neighbor_id", "jac4", "rank")
        .orderBy("seed_id", "rank")
    )


# ---------------------------------------------------------------------------
# Batch 225: lexicon sentiment at corpus scale (PAPERS.md: "Large
# Scale Sentiment Analysis on Twitter with Spark", EDBT 2016 — the
# lexicon-scoring + keyed-rollup shape, here over the documents
# corpus). The lexicon is a deliberately tiny fixed map over the
# fixture vocabulary; the machinery (token explode, broadcast lexicon
# join, integer polarity sums, fixed-point net score) is the real
# artifact.
# ---------------------------------------------------------------------------

SENTIMENT_LEXICON = {"fast": 1, "big": 1, "slow": -1, "small": -1}

_SQL_LEXICON_VALUES = ", ".join(
    f"('{w}', CAST({p} AS BIGINT))" for w, p in sorted(SENTIMENT_LEXICON.items())
)


@register(
    "text_sentiment_lexicon",
    oracle=f"""
        WITH lex(w, pol) AS (VALUES {_SQL_LEXICON_VALUES}),
        toks AS (
            SELECT doc_id, source,
                   unnest(string_split_regex(lower(text), '\\s+')) AS w
            FROM documents
        ),
        hits AS (
            SELECT t.doc_id, t.source, lex.pol
            FROM toks t JOIN lex ON lex.w = t.w
        ),
        per_doc AS (
            SELECT doc_id, source,
                   CAST(sum(CASE WHEN pol > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
                   CAST(sum(CASE WHEN pol < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg
            FROM hits GROUP BY 1, 2
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(pos) AS BIGINT) AS pos_hits,
               CAST(sum(neg) AS BIGINT) AS neg_hits,
               CAST((sum(pos) - sum(neg)) * 10000
                    // (sum(pos) + sum(neg)) AS BIGINT) AS net4,
               CAST(sum(CASE WHEN pos > neg THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_positive_docs,
               CAST(sum(CASE WHEN neg > pos THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_negative_docs
        FROM per_doc
        GROUP BY source
        HAVING (sum(pos) + sum(neg)) > 0
        ORDER BY source
    """,
    tags=("llm-data", "text", "sentiment"),
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale lexicon sentiment (the EDBT-2016 shape): every
    token joins a broadcast polarity lexicon; per-doc positive and
    negative hit counts roll up to a per-source sentiment report with
    an exact fixed-point net score ((pos-neg)*10000 // (pos+neg)) and
    doc-majority polarity counts. The numerator can be NEGATIVE, so
    the cross-engine guarantee is not floor parity — it is that both
    Spark's `div` and DuckDB's `//` on integers truncate TOWARD ZERO,
    so negative net scores quotient identically too (verified
    empirically; a floor-semantics engine would differ on them).

    Scale: the lexicon join is a broadcast hash join against the
    exploded token stream (map-side, no shuffle); both rollups are
    keyed aggregates with map-side combine. At 1000x docs the only
    growth is the linear token scan — the same cost class as
    text_token_stats.
    """
    from kafkastreamer_spark.operators._embed import tokens

    d = load_table(spark, sf_dir, "documents")
    lex = spark.createDataFrame(
        sorted(SENTIMENT_LEXICON.items()), "w string, pol long"
    )
    toks = d.select(
        "doc_id", "source", F.explode(tokens("text")).alias("w")
    )
    hits = toks.join(F.broadcast(lex), "w")
    per_doc = hits.groupBy("doc_id", "source").agg(
        F.sum(F.when(F.col("pol") > 0, 1).otherwise(0)).cast("long").alias("pos"),
        F.sum(F.when(F.col("pol") < 0, 1).otherwise(0)).cast("long").alias("neg"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("pos").cast("long").alias("pos_hits"),
            F.sum("neg").cast("long").alias("neg_hits"),
            F.expr(
                "CAST((sum(pos) - sum(neg)) * 10000 div (sum(pos) + sum(neg)) AS BIGINT)"
            ).alias("net4"),
            F.sum(F.when(F.col("pos") > F.col("neg"), 1).otherwise(0))
            .cast("long")
            .alias("n_positive_docs"),
            F.sum(F.when(F.col("neg") > F.col("pos"), 1).otherwise(0))
            .cast("long")
            .alias("n_negative_docs"),
        )
        .filter(F.col("pos_hits") + F.col("neg_hits") > 0)
        .orderBy("source")
    )
