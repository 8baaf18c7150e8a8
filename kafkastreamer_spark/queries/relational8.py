"""Warehouse-maintenance patterns: CDC merge/upsert and SCD2 history
build. Spark has no MERGE INTO without a table format (Delta/Iceberg),
so the engine exposes merge as the canonical full-outer-join plan —
the same physical shape those formats execute underneath.

Reference grounding: the reference has no mutation surface at all
(append-only Kafka topics, v1/src/main/java/Stream/Streamer.java:
362-386); this is §2-B capability closure for the batch side of a
streaming lakehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.queries._util import fixed, sql_fixed
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "merge_upsert_customers",
    oracle=f"""
        WITH upd AS (
            SELECT user_id AS k, SUM({sql_fixed('value')}) AS delta_fp
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        ins AS (
            SELECT 100000 + event_id AS k, {sql_fixed('value')} AS delta_fp
            FROM events WHERE event_type = 'signup'
        ),
        changes AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
        base AS (
            SELECT c_custkey, {sql_fixed('c_acctbal')} AS bal_fp FROM customer
        )
        SELECT COALESCE(b.c_custkey, c.k) AS custkey,
               CASE WHEN b.c_custkey IS NULL THEN 'insert'
                    WHEN c.k IS NULL THEN 'keep'
                    ELSE 'update' END AS action,
               COALESCE(b.bal_fp, 0) + COALESCE(c.delta_fp, 0) AS bal4
        FROM base b FULL OUTER JOIN changes c ON b.c_custkey = c.k
        ORDER BY custkey
    """,
    tags=("relational", "join", "cdc", "merge"),
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge/upsert: apply a change set derived from the event
    stream onto the customer table — purchases add to the matched
    customer's balance (update), signups create new customer keys
    (insert), untouched rows pass through (keep). This is MERGE INTO
    expressed as the full-outer-join plan that Delta/Iceberg MERGE
    compiles to; the engine emits the merged state + per-row action.

    Scale shape: the change set aggregates first (one shuffle, output
    ≤ |distinct keys|), then ONE full-outer hash join against the
    base — at 100 TB both sides shuffle on the key once; a
    bucketed/partitioned base table makes the re-write side
    partition-prunable (only buckets with changes rewrite, the
    Delta/Iceberg optimization). Balances stay in fixed-point BIGINT
    through the merge, so the result is engine-exact."""
    ev = _t(spark, sf_dir, "events")
    upd = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.sum(fixed("value")).alias("delta_fp"))
    )
    ins = ev.filter(F.col("event_type") == "signup").select(
        (F.lit(100000) + F.col("event_id")).alias("k"),
        fixed("value").alias("delta_fp"),
    )
    changes = upd.unionByName(ins)
    base = _t(spark, sf_dir, "customer").select(
        "c_custkey", fixed("c_acctbal").alias("bal_fp")
    )
    return (
        base.join(changes, base.c_custkey == changes.k, "full_outer")
        .select(
            F.coalesce(base.c_custkey, changes.k).alias("custkey"),
            F.when(base.c_custkey.isNull(), "insert")
            .when(changes.k.isNull(), "keep")
            .otherwise("update")
            .alias("action"),
            (
                F.coalesce(F.col("bal_fp"), F.lit(0))
                + F.coalesce(F.col("delta_fp"), F.lit(0))
            ).alias("bal4"),
        )
        .orderBy("custkey")
    )


@register(
    "events_scd2_intervals",
    oracle="""
        SELECT user_id,
               event_type AS status,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
               strftime(LEAD(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id),
                        '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
               CASE WHEN LEAD(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_current
        FROM events
        ORDER BY user_id, valid_from, status
    """,
    tags=("relational", "window", "scd2", "temporal"),
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: turn a change stream into validity
    intervals — each user's event opens a version valid from its
    timestamp until the next event (NULL valid_to = current row).
    The slowly-changing-dimension type-2 pattern every warehouse
    maintains, built with one LEAD window.

    Scale shape: a single hash shuffle on user_id + per-key sort; no
    self-join (the naive formulation joins each row to its successor).
    At 100 TB this is the same one-pass-per-key cost as the as-of
    join's sweep."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "user_id",
            F.col("event_type").alias("status"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
            F.date_format(F.lead("ts").over(w), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "valid_to"
            ),
            F.when(F.lead("ts").over(w).isNull(), 1).otherwise(0).alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "status")
    )


@register(
    "scalar_regexp",
    oracle=r"""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(sum(CAST(regexp_matches(props, '[02468]}') AS INT))
                    AS BIGINT) AS n_even_end,
               count(DISTINCT regexp_replace(props, '\d', '#', 'g'))
                   AS n_masked_shapes
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("scalar", "regexp"),
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-expression battery: extract (capture group → int),
    boolean match, and global replace, aggregated per event_type so
    the answer is a compact engine-exact summary. Patterns stay inside
    the RE2-compatible subset (no backreferences, no lookaround) —
    the portable dialect across Spark's java.util.regex and DuckDB's
    RE2, and the subset that stays in whole-stage codegen.

    Scale: all three regexps evaluate map-side in the scan stage;
    only (event_type, partial aggregates) reach the exchange. The
    count-distinct adds the usual expand-shuffle; everything else is
    one aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.regexp_extract("props", r'"k": (\d+)', 1).cast("long").alias("k"),
            F.col("props").rlike(r"[02468]}").cast("int").alias("even_end"),
            F.regexp_replace("props", r"\d", "#").alias("masked"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.sum("even_end").cast("long").alias("n_even_end"),
            F.countDistinct("masked").alias("n_masked_shapes"),
        )
        .orderBy("event_type")
    )
