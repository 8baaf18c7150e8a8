"""Streaming embedding near-dup (SemDeDup-style) — the stateful twin
of ``dedup_embedding_cosine`` (operators/dedup.py:498).

The batch operator sign-buckets every vector with 8 md5-derived
hyperplanes and self-joins within buckets; a stream can't self-join
its history, so (exactly like the MinHash twin in streaming/dedup.py)
the bucket history lives in keyed state: ONE stateful operator keyed
by the full 8-bit sign bucket, whose state is the (vec_id, vector)
pairs seen in that bucket. Each arriving vector emits a pair against
every stored bucket-mate whose cosine clears the threshold — including
pairs spanning micro-batches.

Because the blocking key is the FULL signature (one bucket per vector,
not per-band buckets), every qualifying pair is emitted from exactly
one group exactly once — the streamed pair set equals the batch
operator's output verbatim (parity-tested, including the cosine4
fixed-point column: dot products fold sequentially left-to-right in
both engines, so the IEEE doubles match bit-for-bit).

The sign bucket itself is computed MAP-SIDE on the stream (8 plane
projections as plain column expressions) — the batch form's
crossJoin(planes)+groupBy would be a second stateful aggregation on a
stream for no reason.

State bound: <= MAX_VECS_PER_BUCKET vectors per bucket (duplicate
clusters beyond the cap pair against the representative subset —
the MinHash twin's contract); at 100 TB the RocksDB provider and/or
an event-time TTL (streaming/dedup.py's evicting pattern) apply
unchanged.

Reference parity note: no reference analog (keyed int streamer);
SURVEY §2 Part-B similarity/dedup closure (VERDICT r7 stretch #8).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

N_PLANES = 8  # same md5-derived planes as the batch operator
COSINE_DUP_THRESHOLD = 0.4
MAX_VECS_PER_BUCKET = 1000


def _plane_proj(v, p: int):
    """dot(plane_p, v) with the plane vector re-derived from md5 —
    component j = instr('0123456789abcdef', md5('plane{p}_{j}')[0]) - 8.5,
    identical to the batch operator's expression."""
    plane = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: F.instr(
            F.lit("0123456789abcdef"),
            F.substring(
                F.md5(F.concat(F.lit(f"plane{p}_"), i.cast("string"))), 1, 1
            ),
        ).cast("double")
        - 8.5,
    )
    return F.aggregate(
        F.zip_with(plane, v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sign_bucket(v) -> F.Column:
    """8-char '0'/'1' sign bucket of a double-array column — map-side
    (no explode, no groupBy), byte-identical to the batch bucket."""
    return F.concat(
        *[
            F.when(_plane_proj(v, p) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for p in range(N_PLANES)
        ]
    )


def _dot(a, b) -> float:
    # sequential left-to-right fold — bit-parity with _embed.dot's
    # F.aggregate and DuckDB's list_dot_product
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _emit_cosine_pairs(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        ids, vecs = state.get
        seen = [(int(i), list(v)) for i, v in zip(ids, vecs)]
    else:
        seen = []
    have = {i for i, _ in seen}
    new: list[tuple[int, list[float]]] = []
    for pdf in pdfs:
        for vid, vec in zip(pdf["vec_id"], pdf["v"]):
            vid = int(vid)
            if vid not in have:
                have.add(vid)
                new.append((vid, [float(x) for x in vec]))
    new.sort(key=lambda t: t[0])
    rows = []
    for i, (vid_b, vec_b) in enumerate(new):
        nb = math.sqrt(_dot(vec_b, vec_b))
        if nb == 0.0:
            # batch operator's SQL division yields NULL for a zero-norm
            # vector and the pair silently drops — match that instead of
            # raising ZeroDivisionError inside the stateful executor
            continue
        for vid_a, vec_a in seen + new[:i]:
            na = math.sqrt(_dot(vec_a, vec_a))
            if na == 0.0:
                continue
            cos = _dot(vec_a, vec_b) / (na * nb)
            if cos >= COSINE_DUP_THRESHOLD:
                lo, hi = (vid_a, vid_b) if vid_a < vid_b else (vid_b, vid_a)
                rows.append((lo, hi, math.floor(cos * 10000)))
    retained = (seen + new)[:MAX_VECS_PER_BUCKET]
    state.update(
        ([i for i, _ in retained], [v for _, v in retained])
    )
    if rows:
        yield pd.DataFrame(rows, columns=["vec_a", "vec_b", "cosine4"])


def streaming_embedding_cosine_candidates(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, cosine4) near-dup pairs from an embedding stream
    — cosine >= {COSINE_DUP_THRESHOLD} within the 8-plane sign bucket,
    state bounded per bucket, pairs identical to the batch operator's
    (each pair lives in exactly one bucket, so no cross-batch dup
    suppression is needed downstream)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = vectors.select(
        F.col(id_col).alias("vec_id"),
        v.alias("v"),
        sign_bucket(v).alias("bucket"),
    )
    return staged.groupBy("bucket").applyInPandasWithState(
        _emit_cosine_pairs,
        outputStructType="vec_a long, vec_b long, cosine4 long",
        stateStructType="ids array<long>, vecs array<array<double>>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
