"""Distributed frequency sketches with engine-exact semantics.

Spark ships approx sketches (HLL++, count_min_sketch) whose binary
states are not reproducible across engines, so they can't be
oracle-checked bit-for-bit (see ``agg_approx``, the one rows-only
query). The Count-Min sketch here is instead built from first
principles on md5 — the one hash Spark and DuckDB compute identically
— so the *whole sketch*, and every estimate read out of it, is
deterministic and cross-engine exact, while keeping the real CMS
guarantee (estimate ≥ true count; error bounded by N/w per row).

Scale shape: the only full-data shuffle is the exact per-key
pre-aggregation (one exchange on the key). The d×w sketch cells are
built from that *aggregated* table — d rows per distinct key, not per
event — and the cell table (d*w rows, here 256) is broadcast back for
the estimate join. At 100 TB: one shuffle over events, everything
after is broadcast-size. This is also the right incremental shape:
sketches of partitions/batches merge by cell-wise addition.

Reference grounding: the reference keeps exact per-key counts in
unbounded Kafka-compacted state (Streamer.java:323-344); a CMS is the
bounded-memory answer at north-star scale, complementing the
Misra-Gries streaming variant (``keyed_heavy_hitters_stateful``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 64  # buckets per row
TOP_N = 20


def _bucket_sql(d_expr: str, key_expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({d_expr} AS VARCHAR) || ':' ||"
        f" CAST({key_expr} AS VARCHAR)), 1, 8)) AS BIGINT) % {CMS_WIDTH}"
    )


@register(
    "agg_countmin_sketch",
    oracle=f"""
        WITH exact AS (
            SELECT user_id, count(*) AS exact_cnt
            FROM events GROUP BY user_id
        ),
        salted AS (
            SELECT user_id, exact_cnt, d,
                   {_bucket_sql("d", "user_id")} AS bucket
            FROM exact, unnest(range(0, {CMS_DEPTH})) AS u(d)
        ),
        cells AS (
            SELECT d, bucket, CAST(sum(exact_cnt) AS BIGINT) AS cell
            FROM salted GROUP BY d, bucket
        ),
        est AS (
            SELECT s.user_id,
                   max(s.exact_cnt) AS exact_cnt,
                   min(c.cell) AS cms_estimate
            FROM salted s JOIN cells c ON s.d = c.d AND s.bucket = c.bucket
            GROUP BY s.user_id
        )
        SELECT user_id, exact_cnt, cms_estimate,
               cms_estimate - exact_cnt AS overcount
        FROM est
        ORDER BY cms_estimate DESC, user_id LIMIT {TOP_N}
    """,
    tags=("sketch", "aggregate", "streaming-adjacent"),
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over events.user_id (depth 4 × width 64) with
    md5-derived bucket hashes, read back as the top-20 keys by
    estimated frequency alongside their exact counts. Every estimate
    satisfies estimate ≥ exact (CMS never undercounts); the overcount
    column surfaces the collision error.

    The sketch is constructed from the exact per-key aggregate — so
    the event-scale data crosses the network once — and the 256-cell
    sketch is broadcast for the readout join."""
    ev = widen(load_table(spark, sf_dir, "events"))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    salted = exact.select(
        "user_id",
        "exact_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("d").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH,
    )
    cells = salted.groupBy("d", "bucket").agg(
        F.sum("exact_cnt").cast("long").alias("cell")
    )
    est = (
        salted.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("user_id")
        .agg(
            F.max("exact_cnt").alias("exact_cnt"),
            F.min("cell").alias("cms_estimate"),
        )
    )
    return (
        est.select(
            "user_id",
            "exact_cnt",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("cms_estimate"), "user_id")
        .limit(TOP_N)
    )
