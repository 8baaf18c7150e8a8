"""Regression pin for the round-11 cached-plan-AQE finding: with
spark.sql.optimizer.canChangeCachedPlanOutputPartitioning left at its
default (false), every persisted subtree compiles WITHOUT AQE, so
each shuffle under a .persist() runs at the raw
spark.sql.shuffle.partitions (200 empty-ish tasks per stage in a
default-conf driver session) and pins every downstream join to that
width — measured 3-5x wall inflation on the iterative graph kernels
under the driver's plain session (docs/PLAN_AUDIT.md round-11).

load_table() must keep setting the conf (the same runtime-settable
pattern as nanosAsLong), because the verification driver builds its
own SparkSession without ENGINE_CONF.
"""

from __future__ import annotations

from kafkastreamer_spark.session import ENGINE_CONF
from kafkastreamer_spark.tables import load_table

CONF = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"


def test_engine_conf_carries_the_flag():
    assert ENGINE_CONF.get(CONF) == "true"


def test_load_table_sets_the_flag_on_a_plain_session(spark, sf_dir):
    # simulate a driver-built session state: flip the conf off, then
    # verify any load_table call restores it before plans are built
    spark.conf.set(CONF, "false")
    try:
        load_table(spark, sf_dir, "region")
        assert spark.conf.get(CONF) == "true"
    finally:
        spark.conf.set(CONF, "true")
