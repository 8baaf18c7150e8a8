"""text_compression_ratio (operators/quality.py): the rows-only zlib
quality signal — semantics pinned here since no SQL oracle exists."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from kafkastreamer_spark.registry import all_queries


def test_values_match_reference_zlib(spark, sf_dir):
    got = all_queries()["text_compression_ratio"](spark, sf_dir)
    rows = got.collect()
    assert len(rows) > 0
    from kafkastreamer_spark.tables import load_table

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in rows[:50]:
        raw = texts[r["doc_id"]].encode("utf-8")
        assert r["n_bytes"] == len(raw)
        assert r["n_compressed"] == len(zlib.compress(raw, 6))
        assert r["ratio4"] == int(10000 * r["n_compressed"] / r["n_bytes"])


def test_repetitive_compresses_below_diverse(spark, tmp_path):
    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam " * 20),
        (2, " ".join(f"w{i}x{i * 7 % 97}" for i in range(200))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("synth").alias("source"), F.length("text").alias("n_chars"),
    )
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        r["doc_id"]: r["ratio4"]
        for r in all_queries()["text_compression_ratio"](spark, d).collect()
    }
    assert out[1] < out[2] / 3  # repetition collapses under deflate
