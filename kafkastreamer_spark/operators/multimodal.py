"""Multimodal column plumbing (north-star extension).

Treats media as opaque ``binary`` columns with typed metadata. The
container has no image/audio codecs, so the decode step is a
deterministic fake (md5-derived dimensions) behind the real Spark
plumbing: binary columns, Arrow-batched ``mapInPandas`` with an
explicit output schema, and batch-shaped pandas processing — exactly
the shape a real decoder plugs into (swap ``_fake_decode`` for
PIL/ffmpeg and nothing else changes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table


def _blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded as a binary payload column — the fixture
    stand-in for an image/audio blob column."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


@register(
    "multimodal_binary_stats",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               substr(md5(text), 1, 8) AS content_key,
               'image/fake' AS media_type
        FROM documents
        ORDER BY doc_id
    """,
    tags=("llm-data", "multimodal"),
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction, JVM-side only: byte length +
    content key from the blob. At scale this is the cheap pre-pass
    that partitions/filters media before any expensive decode."""
    b = _blobs(spark, sf_dir)
    return (
        b.select(
            "doc_id",
            F.length("payload").cast("long").alias("n_bytes"),
            F.substring(F.md5(F.decode("payload", "UTF-8")), 1, 8).alias("content_key"),
            "media_type",
        )
        .orderBy("doc_id")
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("codec", StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a real media decoder.

    A real implementation would do ``PIL.Image.open(io.BytesIO(...))``
    / ffmpeg frame sampling here; the container ships no codecs, so
    dimensions derive from md5 of the payload (reproducible in SQL for
    the oracle). Raises nothing: undecodable media in a real pipeline
    should yield nulls, not crash the job.
    """
    h = hashlib.md5(payload).hexdigest()
    width = 64 + int(h[0:2], 16)
    height = 64 + int(h[2:4], 16)
    n_frames = 1 + int(h[4], 16)
    return width, height, n_frames, "fake"


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode: one pandas DataFrame per batch in/out.

    Batch shape note: each incoming batch holds whole payload blobs;
    for real media keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
    low enough that batch_size × max_blob_size fits executor memory.
    """
    for pdf in batches:
        decoded = [_fake_decode(p) for p in pdf["payload"]]
        out = pd.DataFrame(decoded, columns=["width", "height", "n_frames", "codec"])
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out.insert(1, "n_bytes", pdf["payload"].map(len).values)
        yield out


@register(
    "multimodal_decode_stub",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(64 + instr('0123456789abcdef', substr(md5(text), 1, 1)) * 16
                    + instr('0123456789abcdef', substr(md5(text), 2, 1)) - 17
                    AS INT) AS width,
               CAST(64 + instr('0123456789abcdef', substr(md5(text), 3, 1)) * 16
                    + instr('0123456789abcdef', substr(md5(text), 4, 1)) - 17
                    AS INT) AS height,
               CAST(1 + instr('0123456789abcdef', substr(md5(text), 5, 1)) - 1
                    AS INT) AS n_frames,
               'fake' AS codec
        FROM documents
        ORDER BY doc_id
    """,
    tags=("llm-data", "multimodal"),
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media decode via Arrow-batched ``mapInPandas`` (the UDF slow
    path, used only where built-ins genuinely can't express the op).

    The decode itself is a deterministic fake (md5-derived dims — the
    oracle reproduces it in SQL), but the Spark plumbing is real:
    binary column in, typed struct schema out, batch-at-a-time pandas.
    Partitioning note: decode is CPU-bound and embarrassingly
    parallel — repartition upstream by size, not count, at scale.
    """
    b = _blobs(spark, sf_dir)
    return (
        b.select("doc_id", "payload")
        .mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)
        .orderBy("doc_id")
    )
