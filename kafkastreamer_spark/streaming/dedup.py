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
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, bucket[, *carry]) rows for a document stream — all
    per-row expressions (works identically on batch DataFrames; the
    batch operator's candidate generation is this + a self-join).
    ``carry`` names extra input columns to pass through unchanged
    (e.g. the event-time column the evicting variant keys its TTL
    on — carried map-side, never a stream-stream self-join)."""
    keep = [F.col(c) for c in carry]
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), tokens(text_col).alias("w"), *keep
        )
        .select("doc_id", shingles(F.col("w")).alias("sh"), *keep)
        .select("doc_id", minhash_array(F.col("sh"), perms).alias("mh"), *keep)
        .select(
            "doc_id",
            F.posexplode(band_sigs(F.col("mh"), perms, bands)).alias("band", "sig"),
            *keep,
        )
        .filter(F.col("sig") != "")
        .select(
            "doc_id",
            F.concat(F.col("band").cast("string"), F.lit(":"), F.col("sig")).alias(
                "bucket"
            ),
            *keep,
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


def streaming_minhash_candidates_evicting(
    docs: DataFrame,
    ts_col: str = "ts",
    ttl_minutes: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    perms: int = DEFAULT_PERMS,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Near-dup candidates with WATERMARK-DRIVEN STATE EVICTION — the
    production form of ``streaming_minhash_candidates`` for unbounded
    streams (VERDICT r6 stretch #8): a bucket whose last arrival is
    older than ``ttl_minutes`` of event time is dropped from the state
    store via GroupStateTimeout.EventTimeTimeout, so state size is
    bounded by the TTL-recent corpus slice instead of growing forever.

    The recall contract is explicit, like every LSH-family trade: a
    duplicate arriving more than TTL after its bucket went quiet pairs
    with NOTHING from before the eviction (it restarts the bucket) —
    the standard windowed-dedup semantics of dropDuplicates-within-
    watermark, applied to near-dup candidates. Pairs within the TTL
    are identical to the unbounded variant's (tested).

    The input must carry ``withWatermark(ts_col, ...)``; the watermark
    delay bounds out-of-orderness, the TTL bounds memory — two
    independent knobs, same as the reference consumer's retention vs
    its transaction window (Streamer.java:113-120 reads committed data
    only; retention is broker-side config).

    Scale: state per bucket is <= MAX_IDS_PER_BUCKET ids + one timeout
    timestamp, keyed-distributed; eviction is the state store's own
    timeout sweep (no scan job). RocksDB provider flips on for 100 TB
    exactly as for the other stateful twins.
    """
    gap_us = ttl_minutes * 60 * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL passed with no arrivals: forget the bucket entirely.
            state.remove()
            return
        seen: list[int] = list(state.get[0]) if state.exists else []
        seen_set = set(seen)
        new: list[int] = []
        last_us = 0
        for pdf in pdfs:
            ts_us = [
                int(v) // 1000
                for v in pd.to_datetime(pdf[ts_col]).astype("int64")
            ]
            if ts_us:
                last_us = max(last_us, max(ts_us))
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
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max((last_us + gap_us) // 1000, wm_ms + 1))
        if pairs:
            yield pd.DataFrame(pairs, columns=["doc_a", "doc_b"])

    sigs = band_signature_stream(
        docs, text_col, id_col, perms, bands, carry=(ts_col,)
    )
    return sigs.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType="doc_a long, doc_b long",
        stateStructType="seen array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
