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

from pyspark.sql import DataFrame, SparkSession

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
