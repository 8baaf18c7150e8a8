"""Shared fixtures: one SparkSession per test session, DuckDB oracle
connection with the fixture tables registered as views (mirrors the
driver's harness)."""

from __future__ import annotations

import os

import duckdb
import pytest

from kafkastreamer_spark.session import get_spark
from kafkastreamer_spark.tables import TABLES

# Small + fast for unit tests; bench uses the real defaults.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="kafkastreamer-spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()
