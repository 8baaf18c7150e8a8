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
