"""SQL entry surface, backpressure batching, and batch↔stream parity
of the shared aggregation expressions."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafkastreamer_spark.sql import run_sql
from kafkastreamer_spark.streaming.sources import file_source, keyed_int_batch


def test_run_sql_over_fixture_views(spark, sf_dir):
    df = run_sql(
        spark,
        sf_dir,
        """
        SELECT r.r_name, COUNT(*) AS n
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """,
    )
    rows = df.collect()
    assert sum(r["n"] for r in rows) == 150  # all sf0.001 customers
    assert [r["r_name"] for r in rows] == sorted(r["r_name"] for r in rows)


def test_max_files_per_trigger_bounds_batches(spark, tmp_path):
    """Backpressure: with maxFilesPerTrigger=1 and 3 input files, the
    availableNow drain runs 3 micro-batches instead of 1."""
    inp = str(tmp_path / "in")
    for i in range(3):
        keyed_int_batch(spark, 10, 2).withColumn(
            "value", F.concat(F.lit(f"{i}-"), "value")
        ).coalesce(1).write.mode("append").parquet(inp)
    schema = StructType(
        [StructField("key", StringType()), StructField("value", StringType())]
    )
    stream = file_source(spark, inp, schema, max_files_per_trigger=1)
    seen = []

    def wb(bdf, bid):
        seen.append((bid, bdf.count()))

    q = (
        stream.writeStream.foreachBatch(wb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(seen) == 3
    assert sum(n for _, n in seen) == 30


def test_batch_stream_expression_parity(spark, sf_dir, tmp_path):
    """The tumbling-window aggregation produces identical results
    whether events flows as a batch table or a file stream — same
    expressions, two runtimes (the unified-model claim, SURVEY §1.4)."""
    from kafkastreamer_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    agg_cols = [
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.floor(F.col("value") * 10000).cast("long")).cast("double") / 10000).alias("sv"),
    ]

    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(*agg_cols)
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("ws"), "event_type", "n", "sv")
    )

    src = str(tmp_path / "ev")
    ev.write.mode("overwrite").parquet(src)
    stream = file_source(spark, src, ev.schema)
    out = str(tmp_path / "out")
    streamed = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(*agg_cols)
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("ws"), "event_type", "n", "sv")
    )

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        streamed.writeStream.foreachBatch(wb)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    last = sorted(os.listdir(out))[-1]
    got = sorted(map(tuple, spark.read.parquet(os.path.join(out, last)).collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want
