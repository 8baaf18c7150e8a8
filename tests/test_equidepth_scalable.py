"""agg_equidepth_histogram_sampled (queries/relational12.py): parity
with the exact ntile formulation, and the plan assertion that closed
round-3 verdict item #1 — no single-task global sort remains."""

from __future__ import annotations

from kafkastreamer_spark.registry import all_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_matches_exact_ntile_variant(spark, sf_dir):
    q = all_queries()
    exact = q["agg_equidepth_histogram"](spark, sf_dir).collect()
    fast = q["agg_equidepth_histogram_sampled"](spark, sf_dir).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in exact]


def test_no_single_partition_window(spark, sf_dir):
    """The exact variant plans `ntile(10)` over an empty partition spec
    (→ Exchange SinglePartition + one-task sort of the whole table).
    The scalable twin must have neither: its only windows are over the
    de-skew bucket (partitioned) and the tiny |buckets|-row counts
    table."""
    import re

    df = all_queries()["agg_equidepth_histogram_sampled"](spark, sf_dir)
    plan = _plan(df)
    assert "_dsk_bkt" in plan, "de-skew bucket missing from plan"
    assert "ntile" not in plan, "ntile window still present"
    # A window with an EMPTY partition spec renders with the sort
    # column first: `windowspecdefinition(o_totalprice#N ASC ...` —
    # that is the Exchange SinglePartition + full-table one-task sort.
    # The de-skewed main-table window always leads with `_dsk_bkt`.
    bad = re.compile(r"windowspecdefinition\(o_totalprice#\d+")
    assert not bad.search(plan), "empty-partition window over orders remains"
    exact_plan = _plan(all_queries()["agg_equidepth_histogram"](spark, sf_dir))
    assert bad.search(exact_plan), (
        "sanity: the exact variant should carry the signature we avoid"
    )
