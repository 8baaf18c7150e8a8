"""De-skewed exact ranking (operators/deskew.py): bit-parity with the
naive global window, and plan assertions that no full-group
single-task sort remains in the samplers flagged `weak` by round-1
VERDICT.md."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators.deskew import bucketed_row_number, md5_ranked
from kafkastreamer_spark.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# ---------------------------------------------------------------------------
# Bit-parity vs the naive single-window formulation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("part", ["lang", "source"])
def test_md5_ranked_matches_global_window(spark, sf_dir, part):
    d = load_table(spark, sf_dir, "documents").select("doc_id", part)
    w = Window.partitionBy(part).orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    naive = d.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy(part))
    )
    fast = md5_ranked(d, [part], "doc_id", "rn", count_name="cnt")
    assert _rows(fast, "doc_id", part, "rn", "cnt") == _rows(
        naive, "doc_id", part, "rn", "cnt"
    )


def test_bucketed_desc_matches_global_window(spark, sf_dir):
    """The n_chars-DESC variant used by sample_quality_quantile."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    naive = d.withColumn("rk", F.row_number().over(w))
    fast = bucketed_row_number(
        d, ["lang"], F.col("n_chars"), [F.col("doc_id").asc()], "rk",
        bucket_desc=True,
    )
    assert _rows(fast, "doc_id", "rk") == _rows(naive, "doc_id", "rk")


def test_md5_ranked_on_synthetic_mega_group(spark):
    """One group holding ~95% of rows — the skew shape the helper
    exists for — still ranks bit-identically."""
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 20 == 0, "tail").otherwise("mega").alias("grp"),
    )
    w = Window.partitionBy("grp").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    naive = df.withColumn("rn", F.row_number().over(w))
    fast = md5_ranked(df, ["grp"], "doc_id", "rn")
    assert _rows(fast, "doc_id", "grp", "rn") == _rows(naive, "doc_id", "grp", "rn")


def test_null_group_and_bucket_rows_kept(spark):
    """Round-2 advisor item: an inner equi-join would silently drop
    rows whose group key or bucket value is NULL, where the window
    formulation keeps them as their own partition / NULLS FIRST order.
    Parity on a frame containing a NULL group, a NULL bucket value,
    and a fully-NULL row. Keys are unique so every ordering is a
    total order (deterministic row_number in both formulations)."""
    rows = [
        ("a", 10, 1),
        ("a", 20, 2),
        ("a", None, 3),  # NULL bucket inside a real group
        (None, 10, 4),  # NULL group
        (None, None, 5),  # NULL group AND bucket
        ("b", 5, 6),
    ]
    df = spark.createDataFrame(rows, "grp string, val int, k int")
    w = Window.partitionBy("grp").orderBy(F.asc("val"), F.asc("k"))
    naive = df.withColumn("rk", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    fast = bucketed_row_number(
        df, ["grp"], F.col("val"), [F.col("k").asc()], "rk", count_name="cnt"
    )

    def nrows(d):  # None-tolerant canonical ordering
        return sorted(
            (tuple(r) for r in d.select("grp", "val", "k", "rk", "cnt").collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    assert nrows(fast) == nrows(naive)
    # nothing dropped
    assert fast.count() == len(rows)


# ---------------------------------------------------------------------------
# Plan shape: the flagged queries must not sort a whole group in one task
# ---------------------------------------------------------------------------

# A window over the full data partitioned ONLY by lang/source and ordered
# by md5(...) renders as `windowspecdefinition(lang#N, md5(...` — the
# de-skewed form always interposes the `_dsk_bkt` bucket column.
_BAD_MD5_WINDOW = re.compile(r"windowspecdefinition\((?:lang|source)#\d+, md5")
_BAD_LEN_WINDOW = re.compile(r"windowspecdefinition\(lang#\d+, n_chars#\d+[L]? DESC")


@pytest.mark.parametrize(
    "qname",
    [
        "sample_source_cap",
        "sample_temperature_mix",
        "sample_balanced_classes",
        "pipeline_corpus_prep",
    ],
)
def test_no_global_group_sort_in_plan(spark, sf_dir, qname):
    from kafkastreamer_spark.registry import all_queries

    plan = _plan(all_queries()[qname](spark, sf_dir))
    assert "_dsk_bkt" in plan, f"{qname}: de-skew bucket missing from plan"
    assert not _BAD_MD5_WINDOW.search(plan), (
        f"{qname}: full-group md5 sort window still present"
    )


def test_quality_quantile_plan_partitions_by_length(spark, sf_dir):
    from kafkastreamer_spark.registry import all_queries

    plan = _plan(all_queries()["sample_quality_quantile"](spark, sf_dir))
    assert not _BAD_LEN_WINDOW.search(plan), (
        "sample_quality_quantile: full-group n_chars sort window still present"
    )


# ---------------------------------------------------------------------------
# bucketed_running_agg: exact parity with the single-window formulation
# ---------------------------------------------------------------------------


def test_running_sum_parity_two_level_buckets(spark, sf_dir):
    """Global running SUM over (q DESC, id ASC) with a tiny-domain
    leading bucket + range tie-break bucket — the shape
    corpus_token_budget_select uses — must equal the whole-table
    ordered window bit for bit."""
    from pyspark.sql import Window

    from kafkastreamer_spark.operators.deskew import bucketed_running_agg
    from kafkastreamer_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") % 5).cast("long").alias("q"),
        (F.col("o_orderkey") % 97).cast("long").alias("v"),
    )
    w = Window.orderBy(F.desc("q"), "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["id"]: r["cum"]
        for r in o.select("id", F.sum("v").over(w).alias("cum")).collect()
    }
    got = {
        r["id"]: r["cum"]
        for r in bucketed_running_agg(
            o,
            [],
            [(F.col("q"), True), (F.floor(F.col("id") / 64).cast("long"), False)],
            [F.asc("id")],
            "v",
            "cum",
            op="sum",
        ).collect()
    }
    assert got == want


def test_running_max_parity_and_grouped(spark, sf_dir):
    """Running MAX per group (and globally) equals the window form —
    the events_lateness_profile shape."""
    from pyspark.sql import Window

    from kafkastreamer_spark.operators.deskew import bucketed_running_agg
    from kafkastreamer_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["event_id"]: r["mx"]
        for r in ev.select(
            "event_id", F.max("ts").over(w).alias("mx")
        ).collect()
    }
    got = {
        r["event_id"]: r["mx"]
        for r in bucketed_running_agg(
            ev,
            ["user_id"],
            [(F.floor(F.col("event_id") / 256).cast("long"), False)],
            [F.asc("event_id")],
            "ts",
            "mx",
            op="max",
        ).collect()
    }
    assert got == want
