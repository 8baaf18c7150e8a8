"""Run every registered query against its DuckDB oracle at the test
scale factor — the same check the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from kafkastreamer_spark.registry import REGISTRY, _ensure_loaded
from tests._compare import assert_matches_oracle

_ensure_loaded()

ORACLE_CHECKED = sorted(name for name, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(name for name, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, oracle_con, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns  # stable schema
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
