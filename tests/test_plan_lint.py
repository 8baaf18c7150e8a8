"""Registry-wide physical-plan lint: global anti-pattern guarantees
that hold for EVERY registered query, not just the hand-audited ones.

Two patterns are banned outright:

* ``CartesianProduct`` — the non-broadcast all-pairs join. Every
  intentional cross join in the library is a broadcast nested loop
  over a scalar aggregate or tiny dimension, which compiles to
  BroadcastNestedLoopJoin, never CartesianProduct.
* ``BatchEvalPython`` — row-at-a-time (pickled) Python UDF execution.
  Every Python path in the engine is Arrow-vectorized
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas / UDTF with
  useArrow) — a BatchEvalPython anywhere means someone added a plain
  @udf to a hot path.
* ``Exchange SinglePartition`` **over a base-table scan** — the
  one-task whole-table sort/merge that works at sf0.01 and falls over
  at 100 TB. Every single-partition exchange in every plan is
  CLASSIFIED (kafkastreamer_spark/plans/audit.py) as scalar_aggregate
  / post_aggregation / literal_local / base_table, and base_table
  must be empty — the round-4 verdict's "123 benign 1-part exchanges"
  prose claim, made executable.

Plans are built (analysis + physical planning), not executed, so the
whole registry lints in well under a minute.
"""

from __future__ import annotations

import pytest

from kafkastreamer_spark.plans.audit import classify_single_partition_exchanges
from kafkastreamer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
ALL = sorted(REGISTRY)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", ALL)
def test_no_cartesian_or_row_python(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = _physical(df)
    assert "CartesianProduct" not in plan, f"{name}: non-broadcast all-pairs join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    labels = classify_single_partition_exchanges(df)
    assert "base_table" not in labels, (
        f"{name}: Exchange SinglePartition over a base-table scan "
        f"(one task holds the whole table at scale): {labels}"
    )


def test_bench_headline_queries_all_registered():
    """bench.py's frozen HEADLINE list must stay resolvable — a
    registry rename would otherwise crash the driver's bench run
    (round-2 postmortem class)."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, missing


def test_single_partition_classifier_canary(spark, sf_dir):
    """The classifier must actually SEE exchanges (a traversal
    regression — e.g. AQE hiding the tree — would otherwise make the
    base_table ban vacuously green) and must label a deliberate
    whole-table one-task window as base_table."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafkastreamer_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    bad = o.select(
        "o_totalprice",
        F.ntile(10)
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("b"),
    )
    assert classify_single_partition_exchanges(bad) == ["base_table"]

    scalar = o.agg(F.count(F.lit(1)).alias("n")).crossJoin(
        o.agg(F.sum("o_orderkey").alias("s"))
    )
    assert "scalar_aggregate" in classify_single_partition_exchanges(scalar) or (
        classify_single_partition_exchanges(scalar) == []
    )

    daily = o.groupBy("o_orderdate").count()
    w = Window.orderBy("o_orderdate")
    series = daily.select("o_orderdate", F.lag("count").over(w).alias("prev"))
    labels = classify_single_partition_exchanges(series)
    assert labels and set(labels) <= {"post_aggregation", "scalar_aggregate"}
