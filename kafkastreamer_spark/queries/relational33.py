"""Round-10 batch 242: modern SQL shorthand surface — GROUP BY ALL /
ORDER BY ALL / star-EXCEPT / LIMIT-OFFSET, executed as SQL TEXT.

``sql_text_modern_shorthand`` completes the Spark-4 SQL-surface
family (pipe syntax, SQL/PSM scripting, session variables, named
parameters, recursive CTEs) with the DuckDB-popularized shorthands
Spark 4 also parses: ``GROUP BY ALL`` (group by every non-aggregate
select item), ``ORDER BY ALL`` (total order over the select list —
deterministic because the grouping key is unique per row),
``SELECT * EXCEPT (col)`` (drop a scratch column without enumerating
the keep-list), and ``LIMIT n OFFSET m`` pagination under a total
order. DuckDB runs the same shapes (its star-drop spelling is
``EXCLUDE``), so the oracle is exact.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B SQL-text
closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.registry import register

_SHORTHAND_SQL = """
    WITH cells AS (
        SELECT o_orderpriority AS priority, o_orderstatus AS status,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(FLOOR(o_totalprice * 10000) AS BIGINT))
                    AS BIGINT) AS rev4,
               CAST(sum(CAST(FLOOR(o_totalprice * 10000) AS BIGINT))
                    div count(*) AS BIGINT) AS _scratch_avg4
        FROM orders
        GROUP BY ALL
    ),
    page AS (
        SELECT * FROM cells
        ORDER BY rev4 DESC, priority, status
        LIMIT 10 OFFSET 2
    ),
    final AS (
        SELECT * EXCEPT (_scratch_avg4), _scratch_avg4 AS avg_rev4
        FROM page
    )
    SELECT * FROM final ORDER BY ALL
"""


@register(
    "sql_text_modern_shorthand",
    oracle="""
        WITH cells AS (
            SELECT o_orderpriority AS priority, o_orderstatus AS status,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(FLOOR(o_totalprice * 10000) AS BIGINT))
                        AS BIGINT) AS rev4,
                   CAST(sum(CAST(FLOOR(o_totalprice * 10000) AS BIGINT))
                        // count(*) AS BIGINT) AS _scratch_avg4
            FROM orders
            GROUP BY ALL
        ),
        page AS (
            SELECT * FROM cells
            ORDER BY rev4 DESC, priority, status
            LIMIT 10 OFFSET 2
        ),
        final AS (
            SELECT * EXCLUDE (_scratch_avg4), _scratch_avg4 AS avg_rev4
            FROM page
        )
        SELECT * FROM final ORDER BY ALL
    """,
    tags=("sql-surface", "relational", "shorthand"),
)
def sql_text_modern_shorthand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-(priority, status) order counts and fixed-point revenue,
    paginated to ranks 3-12 by revenue — written entirely in the
    modern SQL shorthands (GROUP BY ALL, ORDER BY ALL, * EXCEPT,
    LIMIT/OFFSET) and executed as text through the engine's SQL door;
    the oracle is the same text on DuckDB with its * EXCLUDE
    spelling. The page window carries a full tie-break
    (rev4 DESC, priority, status) and ORDER BY ALL re-sorts a
    unique-keyed row set, so pagination is deterministic on both
    engines.

    Scale shape: one map-side-combining aggregate over orders to a
    |priorities| x |statuses| cell table; pagination and the star
    projections run on those ~15 rows.
    """
    from kafkastreamer_spark.sql import run_sql

    df = run_sql(spark, sf_dir, _SHORTHAND_SQL)
    return df.select(
        "priority",
        "status",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("rev4").cast("long").alias("rev4"),
        F.col("avg_rev4").cast("long").alias("avg_rev4"),
    )
