"""Streaming near-duplicate detection (north-star dedup, streaming
form): MinHash-LSH over an unbounded document stream.

The batch operator (operators/dedup.py) self-joins band signatures;
a stream can't self-join its whole history, so the history lives in
keyed state instead: the per-row signature build (shuffle-free,
operators/_embed.minhash_array) feeds ONE stateful operator keyed by
(band, signature) whose state is the doc-ids seen in that bucket.
Each arriving doc emits candidate pairs against everything already in
its buckets — including pairs that span micro-batches.

State growth is bounded the usual ways at scale: RocksDB state store
(session.ROCKSDB_STATE_CONF), a TTL on bucket state, and/or a cap on
retained ids per bucket (duplicate clusters beyond the cap emit
against the representative subset).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kafkastreamer_spark.operators._embed import (
    band_sigs,
    minhash_array,
    shingles,
    tokens,
)

DEFAULT_PERMS = 12
DEFAULT_BANDS = 4
MAX_IDS_PER_BUCKET = 1000  # state cap; see module docstring


def band_signature_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    perms: int = DEFAULT_PERMS,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """(doc_id, bucket) rows for a document stream — all per-row
    expressions (works identically on batch DataFrames; the batch
    operator's candidate generation is this + a self-join)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("w"))
        .select("doc_id", shingles(F.col("w")).alias("sh"))
        .select("doc_id", minhash_array(F.col("sh"), perms).alias("mh"))
        .select(
            "doc_id",
            F.posexplode(band_sigs(F.col("mh"), perms, bands)).alias("band", "sig"),
        )
        .filter(F.col("sig") != "")
        .select(
            "doc_id",
            F.concat(F.col("band").cast("string"), F.lit(":"), F.col("sig")).alias(
                "bucket"
            ),
        )
    )


def _emit_pairs(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: list[int] = list(state.get[0]) if state.exists else []
    new: list[int] = []
    seen_set = set(seen)
    for pdf in pdfs:
        for d in pdf["doc_id"]:
            d = int(d)
            if d not in seen_set:
                seen_set.add(d)
                new.append(d)
    new.sort()
    pairs = []
    for i, b in enumerate(new):
        for a in seen + new[:i]:
            lo, hi = (a, b) if a < b else (b, a)
            pairs.append((lo, hi))
    retained = (seen + new)[:MAX_IDS_PER_BUCKET]
    state.update((retained,))
    if pairs:
        yield pd.DataFrame(pairs, columns=["doc_a", "doc_b"])


def streaming_minhash_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    perms: int = DEFAULT_PERMS,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Candidate near-dup pairs from a document stream.

    Output may contain the same pair from multiple bands/batches —
    consumers dedupe downstream (``dropDuplicates`` with a watermark,
    or idempotent sink keys), matching the batch operator's DISTINCT.
    """
    sigs = band_signature_stream(docs, text_col, id_col, perms, bands)
    return sigs.groupBy("bucket").applyInPandasWithState(
        _emit_pairs,
        outputStructType="doc_a long, doc_b long",
        stateStructType="seen array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
