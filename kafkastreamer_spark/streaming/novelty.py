"""Streaming corpus-novelty gate with BOUNDED state: a Bloom filter
over every admitted document's word 3-grams.

The batch novelty diagnostics (``text_ngram_novelty_decile``,
``dedup_rate_by_decile``) tell a curator the intake is re-crawling
known content; the production response is to GATE at intake: admit a
document only if enough of its n-grams are new. Exact "seen n-grams"
state is unbounded (it grows with the distinct-shingle count of the
corpus — the same trap as the TTL-less exact_dedup stage,
plans/corpus_pipeline.py); this twin bounds it with the classic
one-sided trade: a fixed m-bit Bloom filter whose false positives can
only UNDERCOUNT a document's novelty (a genuinely novel shingle may
be counted as seen; a seen shingle is never counted novel). The gate
is therefore conservative-reject: it never admits a document the
exact gate would reject, and rejects a borderline novel document with
probability bounded by the standard Bloom FP formula
(1 - e^{-kn/m})^k per shingle lookup. At the default m = 2^22 bits
(512 KiB) and k = 4 the per-lookup FP stays under 1e-4 up to ~260k
distinct admitted shingles; size m to the corpus (the state is
m/8 bytes FOREVER, regardless of corpus size — that is the point).

Replay/crash semantics: the bloom union is IDEMPOTENT (bitwise OR),
so a replayed batch converges without the applied-batch skip; the
state still goes through ``streaming/statedir.py`` for the atomic
pointer flip (a crash mid-publish never corrupts the only copy), and
survivors land in batchId-keyed dirs (replay overwrites its own dir —
the exactly_once_parquet_sink contract).

Determinism: shingle arrays come from the SAME Spark expression as
the batch operators (no tokenizer drift); bits are double-hashed from
the shingle's md5 (h1 + i*h2 mod m), so a given corpus always maps to
the same bitmap — the gate's decisions are reproducible bit-for-bit.

Scale: per batch, one Arrow pass scores documents against the
broadcast bitmap and one Arrow pass emits per-partition bitmaps of
the ADMITTED documents' shingles (each m/8 bytes); the driver ORs
#partitions bitmaps — a bounded, documented driver materialization of
the same class as the IVF list-id collects. No shuffle at all.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B intake
closure (round-8 streaming-twin ratchet).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import shingles, tokens
from kafkastreamer_spark.streaming import statedir

BLOOM_BITS = 1 << 22  # 512 KiB of state, forever
BLOOM_HASHES = 4
NOVELTY_THRESHOLD = 0.5  # admit docs with >= 50% unseen shingles


def _positions(shingle: str, m: int) -> list[int]:
    d = hashlib.md5(shingle.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:16], "big")
    return [(h1 + i * h2) % m for i in range(BLOOM_HASHES)]


def _test(bloom: np.ndarray, pos: list[int]) -> bool:
    return all(bloom[p >> 3] & (1 << (p & 7)) for p in pos)


def _set(bloom: np.ndarray, pos: list[int]) -> None:
    for p in pos:
        bloom[p >> 3] |= 1 << (p & 7)


def bloom_fill_ratio(bloom_bytes: bytes) -> float:
    """Fraction of set bits — the capacity gauge an operator watches
    (FP rate rises with fill; re-size m when this passes ~0.5)."""
    arr = np.frombuffer(bloom_bytes, dtype=np.uint8)
    return float(np.unpackbits(arr).sum()) / (len(arr) * 8)


def read_bloom(spark: SparkSession, state_dir: str) -> bytes | None:
    df = statedir.read_state(spark, state_dir)
    if df is None:
        return None
    return bytes(df.collect()[0]["bloom"])


def maintain_novelty_gate(
    stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = NOVELTY_THRESHOLD,
    m_bits: int = BLOOM_BITS,
    pre_flip_hook=None,
):
    """Run the gate over a document stream: survivors (novelty >=
    ``threshold``, no-shingle docs always pass) land in
    ``out_dir/batch_id=N``; the bloom state lives in ``state_dir``.
    Returns the StreamingQuery (availableNow trigger)."""
    import os

    spark = stream.sparkSession

    def process(bdf: DataFrame, batch_id: int) -> None:
        prior = read_bloom(spark, state_dir)
        bloom0 = (
            np.frombuffer(prior, dtype=np.uint8).copy()
            if prior is not None
            else np.zeros(m_bits // 8, dtype=np.uint8)
        )
        bc = spark.sparkContext.broadcast(bloom0.tobytes())

        staged = bdf.withColumn("_sh", shingles(tokens(text_col), n))

        def score(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            bl = np.frombuffer(bc.value, dtype=np.uint8)
            for pdf in pdfs:
                keep = []
                for arr in pdf["_sh"]:
                    k = len(arr)
                    if k == 0:
                        keep.append(True)
                        continue
                    novel = sum(
                        0 if _test(bl, _positions(s, m_bits)) else 1
                        for s in arr
                    )
                    keep.append(novel >= threshold * k)
                yield pdf[pd.Series(keep, index=pdf.index)]

        survivors = staged.mapInPandas(score, schema=staged.schema).persist()
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        survivors.drop("_sh").write.mode("overwrite").parquet(target)

        def bits(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            part = np.zeros(m_bits // 8, dtype=np.uint8)
            any_rows = False
            for pdf in pdfs:
                for arr in pdf["_sh"]:
                    for s in arr:
                        _set(part, _positions(s, m_bits))
                        any_rows = True
            if any_rows:
                yield pd.DataFrame({"b": [part.tobytes()]})

        parts = survivors.select("_sh").mapInPandas(
            bits, schema="b binary"
        ).collect()  # bounded: #partitions x m/8 bytes (documented)
        merged = bloom0
        for r in parts:
            merged |= np.frombuffer(r["b"], dtype=np.uint8)
        state_df = spark.createDataFrame(
            [(bytearray(merged.tobytes()),)], "bloom binary"
        ).coalesce(1)
        statedir.publish_state(
            state_df, state_dir, batch_id, pre_flip_hook=pre_flip_hook
        )
        survivors.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
