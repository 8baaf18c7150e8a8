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

Plans are built (analysis + physical planning), not executed, so the
whole registry lints in well under a minute.
"""

from __future__ import annotations

import pytest

from kafkastreamer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
ALL = sorted(REGISTRY)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", ALL)
def test_no_cartesian_or_row_python(spark, sf_dir, name):
    plan = _physical(REGISTRY[name].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: non-broadcast all-pairs join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_bench_headline_queries_all_registered():
    """bench.py's frozen HEADLINE list must stay resolvable — a
    registry rename would otherwise crash the driver's bench run
    (round-2 postmortem class)."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, missing
