"""Salting helpers: result equivalence with unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamer_spark.operators.skew import salted_join, with_salt
from kafkastreamer_spark.tables import load_table


def test_with_salt_deterministic_and_bounded(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    s1 = with_salt(o, 8).select("o_orderkey", "_salt")
    s2 = with_salt(o, 8).select("o_orderkey", "_salt")
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    mn, mx = s1.agg(F.min("_salt"), F.max("_salt")).collect()[0]
    assert 0 <= mn and mx <= 7


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    plain = li.join(o, "k").agg(
        F.count(F.lit(1)), F.sum(F.floor(F.col("o_totalprice"))).cast("long")
    )
    salted = salted_join(li, o, "k", n_salts=4).agg(
        F.count(F.lit(1)), F.sum(F.floor(F.col("o_totalprice"))).cast("long")
    )
    assert plain.collect() == salted.collect()


def test_aqe_skew_join_fires_at_runtime(spark):
    """The 100 TB skew posture leans on AQE's skew-join
    (ENGINE_CONF enables it): prove it actually splits a hot
    partition at runtime — the executed plan must show
    SortMergeJoin(skew=true) with a skewed AQEShuffleRead.

    Caveat pinned here because it bites in production: AQE will NOT
    split the skewed partition when the join feeds an aggregate on
    the join key (splitting would break the aggregate's required
    distribution) — which is exactly when the engine's explicit
    salting operators (join_skew_salted / skew_salted_agg) are the
    right tool instead.
    """
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prior = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = (
            spark.range(0, 400_000)
            .select(F.lit(0).alias("k"), F.col("id").alias("v"))
            .unionAll(
                spark.range(0, 99_000).select(
                    (F.col("id") % 99 + 1).alias("k"), F.col("id").alias("v")
                )
            )
        )
        small = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        j = (
            big.join(small, "k")
            .groupBy((F.col("v") % 13).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = j.collect()
        assert sum(r["n"] for r in rows) == 499_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
