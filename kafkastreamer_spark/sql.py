"""SQL entry surface: run ad-hoc SQL over the engine's tables.

The DataFrame query library is the primary surface; this gives users
the equivalent ``spark.sql`` door with the fixture tables (or any
table dict) pre-registered as temp views — Catalyst treats both
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafkastreamer_spark.session import ensure_engine_conf
from kafkastreamer_spark.tables import TABLES, register_views


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Execute SQL with all fixture tables registered as views.

    Also registers the shared-dialect helper ``epoch_us(ts)`` as a
    Spark SQL scalar UDF (``RETURN unix_micros(ts)``) — the driver
    defines the same name as a DuckDB macro for the oracles, so SQL
    text using it runs verbatim on BOTH engines (exercised by
    sql_text_shared_dialect_gaps)."""
    ensure_engine_conf(spark)
    register_views(spark, sf_dir, TABLES)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION epoch_us(x TIMESTAMP) "
        "RETURNS BIGINT RETURN unix_micros(x)"
    )
    return spark.sql(query)
