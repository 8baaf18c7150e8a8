"""Round-9 batch 234: Spark 4 SQL-surface closure — procedural SQL
scripting, session variables, parameterized SQL.

Three entry-point certifications, each running REAL work through a
surface a migrating SQL user reaches for on day one:

* ``sql_script_iterative_trim`` — SQL scripting (BEGIN / DECLARE /
  WHILE / END, SQL/PSM): a data-dependent iterative computation
  written as a procedural script and executed by ``spark.sql`` in
  one shot — the engine's answer to stored-procedure-style logic.
* ``sql_text_session_variables`` — ``DECLARE VARIABLE`` +
  ``SET VAR ... = (scalar subquery)``: two-step parameterization
  through session state, the pattern BI tools use for "compute the
  threshold, then slice by it".
* ``sql_text_parameterized`` — named-parameter binding
  (``spark.sql(query, args=...)``): the injection-safe client API;
  the SQL text carries ``:name`` markers, never inlined literals.

All three produce deterministic integer aggregates with exact DuckDB
oracles (the oracle inlines/unrolls what the surface binds/iterates —
two genuinely different evaluation paths agreeing exactly).

Reference parity note: the reference has no SQL surface at all
(keyed int streamer, v1/src/main/java/Stream/Streamer.java); this
extends the SURVEY §2 Part-B "SQL text entry" closure to the Spark 4
procedural/variable/parameter trio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafkastreamer_spark.registry import register
from kafkastreamer_spark.sql import run_sql
from kafkastreamer_spark.tables import TABLES, register_views

_TRIM_ITERS = 3


def _trim_oracle() -> str:
    # unroll the script's 3 iterations: t_{k+1} = floor-mean of
    # quantities <= t_k, starting from the global max
    steps = ["t0 AS (SELECT CAST(max(l_quantity) AS BIGINT) AS t FROM lineitem)"]
    for k in range(1, _TRIM_ITERS + 1):
        steps.append(
            f"""t{k} AS (
                SELECT CAST(sum(CAST(l_quantity AS BIGINT))
                            // count(*) AS BIGINT) AS t
                FROM lineitem WHERE CAST(l_quantity AS BIGINT)
                    <= (SELECT t FROM t{k - 1})
            )"""
        )
    return f"""
        WITH {", ".join(steps)}
        SELECT (SELECT t FROM t{_TRIM_ITERS}) AS final_threshold,
               CAST(count(*) AS BIGINT) AS n_below,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_below
        FROM lineitem
        WHERE CAST(l_quantity AS BIGINT) <= (SELECT t FROM t{_TRIM_ITERS})
    """


@register(
    "sql_script_iterative_trim",
    oracle=_trim_oracle(),
    tags=("sql", "scripting", "iterative"),
)
def sql_script_iterative_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-scripting certification: an iterated trimmed threshold on
    lineitem quantities — start at the max, and {_TRIM_ITERS} times
    re-set the threshold to the floor-mean of quantities at or below
    it (each iteration's predicate depends on the previous result, so
    the loop is genuinely sequential) — written as a SQL/PSM script
    (BEGIN / DECLARE / WHILE / SET from scalar subquery / END) and
    executed by one ``spark.sql`` call. The oracle unrolls the same
    {_TRIM_ITERS} steps as chained CTEs; floor-mean is integer
    ``div`` on both engines, so agreement is exact.

    Scale shape: each iteration is one aggregate over the table with
    map-side combine (Catalyst plans every loop body independently;
    the script driver only carries the scalar between them) — the
    same cost class as running {_TRIM_ITERS} separate aggregate
    queries, with no driver-side data movement beyond one scalar.
    """
    return run_sql(
        spark,
        sf_dir,
        f"""
        BEGIN
          DECLARE t BIGINT;
          DECLARE i INT DEFAULT 0;
          SET t = (SELECT CAST(max(l_quantity) AS BIGINT) FROM lineitem);
          WHILE i < {_TRIM_ITERS} DO
            SET t = (SELECT sum(CAST(l_quantity AS BIGINT))
                            div count(*)
                     FROM lineitem
                     WHERE CAST(l_quantity AS BIGINT) <= t);
            SET i = i + 1;
          END WHILE;
          SELECT t AS final_threshold,
                 CAST(count(*) AS BIGINT) AS n_below,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_below
          FROM lineitem WHERE CAST(l_quantity AS BIGINT) <= t;
        END
        """,
    )


@register(
    "sql_text_session_variables",
    oracle="""
        WITH cut AS (
            SELECT sum(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                   // count(*) AS c
            FROM orders
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(*) FILTER (
                    WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                        > (SELECT c FROM cut)) AS BIGINT) AS n_above_mean,
               CAST((count(*) FILTER (
                    WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                        > (SELECT c FROM cut)) * 10000)
                    // count(*) AS BIGINT) AS share_above4
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("sql", "variables"),
)
def sql_text_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-variable certification: ``DECLARE OR REPLACE VARIABLE``
    + ``SET VAR ... = (scalar subquery)`` computes the corpus-wide
    mean order value (exact cents), then the main query slices every
    priority class against the variable — the compute-then-filter
    two-step BI parameterization pattern, state carried in the
    session, not inlined text. The oracle inlines the same cut as a
    CTE; all arithmetic is exact integer cents.

    Scale shape: the variable assignment is one scalar aggregate; the
    main query is one grouped aggregate with the scalar broadcast
    into the predicate by Catalyst (a literal after binding) — two
    scans total, no join.
    """
    register_views(spark, sf_dir, TABLES)
    spark.sql("DECLARE OR REPLACE VARIABLE mean_cents BIGINT")
    spark.sql(
        "SET VAR mean_cents = (SELECT sum(CAST(FLOOR(o_totalprice * 100)"
        " AS BIGINT)) div count(*) FROM orders)"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count_if(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                    > mean_cents) AS BIGINT) AS n_above_mean,
               CAST((count_if(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                    > mean_cents) * 10000) div count(*) AS BIGINT)
                   AS share_above4
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


_PARAM_MIN_QTY = 30
_PARAM_STATUS = "F"


@register(
    "sql_text_parameterized",
    oracle=f"""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem
        WHERE CAST(l_quantity AS BIGINT) >= {_PARAM_MIN_QTY}
          AND l_linestatus = '{_PARAM_STATUS}'
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("sql", "parameters"),
)
def sql_text_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter binding certification: the SQL text carries
    ``:min_qty`` / ``:status`` markers and ``spark.sql(..., args=...)``
    binds them — the injection-safe client API (parameters bind as
    typed literals in the analyzer, they are never string-spliced).
    The oracle is the same query with the literals inlined; exact
    integer arithmetic throughout.

    Scale shape: one grouped aggregate; after binding, the parameter
    predicates are ordinary literal filters and push down to the
    parquet scan like any constant.
    """
    register_views(spark, sf_dir, TABLES)
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem
        WHERE CAST(l_quantity AS BIGINT) >= :min_qty
          AND l_linestatus = :status
        GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        args={"min_qty": _PARAM_MIN_QTY, "status": _PARAM_STATUS},
    )
