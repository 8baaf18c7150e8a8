"""Invariants for the recursive-CTE batch (relational17) beyond the
oracle sweep: closed-form checks the DuckDB comparison cannot see
(it would be wrong in the same way if the recursion itself were), and
pins for the two Spark dialect constraints the batch is shaped around
(UNION-ALL-only recursion, 100-level default ceiling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkastreamer_spark.queries.relational17 import (
    sql_text_recursive_bom_closure,
    sql_text_recursive_customer_chain,
    sql_text_recursive_month_spine,
)
from kafkastreamer_spark.tables import load_table


def test_month_spine_contiguous_and_total(spark, sf_dir):
    rows = sql_text_recursive_month_spine(spark, sf_dir).collect()
    months = [r.yr * 12 + r.mo for r in rows]
    # recursion generated every month exactly once, no gaps
    assert months == list(range(months[0], months[-1] + 1))
    orders = load_table(spark, sf_dir, "orders")
    assert sum(r.n_orders for r in rows) == orders.count()
    expected_cents = orders.select(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("c")
    ).collect()[0].c
    assert sum(r.revenue_cents for r in rows) == expected_cents


def test_customer_chain_equals_window_formulation(spark, sf_dir):
    got = {
        r.o_custkey: (r.chain_len, r.total_cents)
        for r in sql_text_recursive_customer_chain(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 10 == 0
    )
    want = {
        r.o_custkey: (r.n, r.cents)
        for r in orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
        .collect()
    }
    assert got == want


def _heap_subtree(root: int, mk: int):
    """Closed-form-checkable walk of the dense-key heap DAG."""
    nodes, frontier, depth = [], [root], 0
    max_depth = 0
    while frontier:
        nodes.extend(frontier)
        max_depth = depth
        frontier = [
            c
            for n in frontier
            for c in (2 * n + 1, 2 * n + 2)
            if c <= mk
        ]
        depth += 1
    return len(nodes), max_depth, sum(nodes)


def test_bom_closure_matches_closed_form(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    mk = part.agg(F.max("p_partkey")).collect()[0][0]
    rows = sql_text_recursive_bom_closure(spark, sf_dir).collect()
    assert [r.root for r in rows] == list(range(min(8, mk + 1)))
    for r in rows:
        n_nodes, max_depth, sum_keys = _heap_subtree(r.root, mk)
        assert (r.n_nodes, r.max_depth, r.sum_keys) == (
            n_nodes,
            max_depth,
            sum_keys,
        ), f"root {r.root}"


def test_dialect_pin_union_distinct_rejected(spark):
    """The batch's shape depends on Spark recursion being UNION-ALL-
    only; if an upgrade lifts this, revisit whether the closure
    entries should move to fixed-point UNION semantics."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="UNION_NOT_SUPPORTED"):
        spark.sql(
            "WITH RECURSIVE r(n) AS (SELECT 1 UNION "
            "SELECT n + 1 FROM r WHERE n < 3) SELECT * FROM r"
        ).collect()


def test_dialect_pin_recursion_ceiling(spark):
    """Default 100-level ceiling: the batch's depth bounds (80 months,
    24 orders/customer, log2(parts)) must stay under it."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((PySparkException, Py4JJavaError)):
        spark.sql(
            "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
            "SELECT n + 1 FROM t WHERE n < 150) SELECT count(*) FROM t"
        ).collect()


def test_customer_chain_depth_headroom(spark):
    """ADVICE r6: sql_text_recursive_customer_chain's recursion depth
    is max orders-per-customer, and Spark's 100-level ceiling has no
    runtime guard — a fixture (or inflation probe) whose chains exceed
    it fails the query outright. Pin the invariant at EVERY swept SF:
    max chain length must keep >=20% headroom below the ceiling, so
    modest data drift trips this test before it trips the query.
    (The x4 scale probe already measured ~96 levels — inflation remaps
    order keys onto FEWER synthetic customers, which is exactly the
    regime this canary exists for; probes that inflate orders must
    re-derive depth, see the module docstring's depth-bound table.)
    """
    import os

    from kafkastreamer_spark.tables import load_table

    base = os.path.dirname(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = os.path.join(base, sf)
        if not os.path.isdir(sf_dir):
            continue
        orders = load_table(spark, sf_dir, "orders")
        max_chain = (
            orders.groupBy("o_custkey")
            .count()
            .agg(F.max("count").alias("m"))
            .collect()[0]["m"]
        )
        assert max_chain <= 80, (
            f"{sf}: max orders/customer {max_chain} is within 20% of "
            "Spark's 100-level recursion ceiling — "
            "sql_text_recursive_customer_chain will start failing"
        )
