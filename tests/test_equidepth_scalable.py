"""agg_equidepth_histogram + agg_equidepth_histogram_sampled: both use
the bucketed-rank construction since round 5 (the round-4 verdict's #1
item swapped the legacy ntile body). Parity is pinned against an
INLINE single-window ntile formulation (kept here as the spec, not in
the registry), and both registered plans are asserted free of the
whole-table single-partition sort."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafkastreamer_spark.registry import all_queries
from kafkastreamer_spark.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _inline_ntile_spec(spark, sf_dir):
    """The semantics both registered variants must reproduce
    bit-identically: ntile(10) over the (price, orderkey) total order."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .select(F.col("bin").cast("long").alias("bin"), "n", "lo", "hi")
        .orderBy("bin")
    )


def test_both_variants_match_ntile_spec(spark, sf_dir):
    q = all_queries()
    spec = [tuple(r) for r in _inline_ntile_spec(spark, sf_dir).collect()]
    legacy = [tuple(r) for r in q["agg_equidepth_histogram"](spark, sf_dir).collect()]
    fast = [
        tuple(r)
        for r in q["agg_equidepth_histogram_sampled"](spark, sf_dir).collect()
    ]
    assert legacy == spec
    assert fast == spec


def test_no_single_partition_window(spark, sf_dir):
    """A window with an EMPTY partition spec plans `Exchange
    SinglePartition` + a one-task sort of the whole table. Neither
    registered variant may carry it: their only windows are over the
    de-skew bucket (partitioned) and the tiny |buckets|-row counts
    table."""
    import re

    # The empty-partition window renders with the sort column first:
    # `windowspecdefinition(o_totalprice#N ASC ...`. The de-skewed
    # main-table window always leads with `_dsk_bkt`.
    bad = re.compile(r"windowspecdefinition\(o_totalprice#\d+")
    for name in ("agg_equidepth_histogram", "agg_equidepth_histogram_sampled"):
        plan = _plan(all_queries()[name](spark, sf_dir))
        assert "_dsk_bkt" in plan, f"{name}: de-skew bucket missing from plan"
        assert "ntile" not in plan, f"{name}: ntile window still present"
        assert not bad.search(plan), f"{name}: empty-partition window remains"
    # sanity: the inline spec DOES carry the signature we avoid
    assert bad.search(_plan(_inline_ntile_spec(spark, sf_dir)))
