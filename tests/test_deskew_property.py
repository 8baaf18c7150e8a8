"""Property-based check (hypothesis) for the de-skew ranking core:
bucketed_row_number must be bit-identical to the naive global window
on arbitrary small frames — including ties, negative bucket values,
skewed groups, and NULL-free/NULL-bearing mixes. The example-based
tests in test_deskew.py pin known shapes; this sweeps the space."""

from __future__ import annotations

import pytest

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafkastreamer_spark.operators.deskew import bucketed_row_number  # noqa: E402

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2", "g3"]),  # group
        st.integers(min_value=-50, max_value=50),  # bucket-source value
        st.integers(min_value=0, max_value=10_000),  # unique-ified key below
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=15,  # each example runs two Spark jobs; keep bounded
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_matches_naive_window_on_random_frames(spark, rows):
    # make keys unique so both formulations have a total order
    data = [(g, v, i) for i, (g, v, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "grp string, val int, k int")

    w = Window.partitionBy("grp").orderBy(F.asc("val"), F.asc("k"))
    naive = df.withColumn("rk", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    fast = bucketed_row_number(
        df,
        ["grp"],
        # a coarse bucket (val div 7) exercises multi-row buckets and
        # negative bucket ids; it is a prefix of (val, k) ordering
        F.floor(F.col("val") / 7).cast("long"),
        [F.col("val").asc(), F.col("k").asc()],
        "rk",
        count_name="cnt",
    )
    key = lambda r: (r["grp"], r["k"])  # noqa: E731
    got = sorted(
        ((r["grp"], r["k"], r["rk"], r["cnt"]) for r in fast.collect()),
    )
    want = sorted(
        ((r["grp"], r["k"], r["rk"], r["cnt"]) for r in naive.collect()),
    )
    assert got == want
