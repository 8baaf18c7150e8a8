"""Streaming twin of the C4-style global line dedup
(``dedup_lines_global``, operators/quality.py) — the last dedup-family
entry without a streaming form (VERDICT r8 stretch #7).

Batch semantics being twinned: every document splits into consecutive
5-token "lines"; each distinct line keeps its FIRST occurrence
corpus-wide under (doc_id, li) order and drops every other copy.

Streaming form: the line table is keyed by md5(line) and flows through
``applyInPandasWithState`` — one state entry per distinct line hash,
holding nothing but its existence plus an event-time timeout (the
evicting-LSH pattern, streaming/dedup.py:123). Within a micro-batch
the key group is sorted by (doc_id, li) before the first-occurrence
decision, so the kept row is bit-identical to the batch window's
``row_number() = 1`` choice, not an arrival-order accident; across
micro-batches a line seen in any earlier batch drops. When every
arrival fits inside the TTL, the kept (doc_id, li) set EQUALS the
batch operator's (parity-tested); a line whose hash went quiet for
longer than ``ttl_minutes`` of event time is evicted by
``GroupStateTimeout.EventTimeTimeout`` and its next occurrence is
treated as first again — the standard windowed-dedup recall trade,
stated exactly like ``streaming_minhash_candidates_evicting``'s.

The operator emits the KEPT LINES stream ``(doc_id, li, line)``;
document reassembly is a per-doc groupBy downstream (a second
stateful stage in the same query would violate the micro-batch
planner's single-stateful-operator lineage for update mode, so it
belongs to the consumer or a foreachBatch sink — the parity test
reassembles with the same array_sort expression the batch operator
uses).

Crash/replay: all state lives in the streaming state store under the
query checkpoint (no side-channel state), so restart recovery is the
engine's own changelog replay — restart-parity is tested; the
RocksDB provider flips on for 100 TB exactly as for the other
stateful twins. State size is bounded by the TTL-recent distinct-line
count, keyed-distributed; the per-key payload is ~1 byte + the
timeout timestamp, far below the evicting-LSH id lists.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B streaming
closure of the sub-document dedup family.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kafkastreamer_spark.operators.quality import LINE_TOKENS

DEFAULT_TTL_MINUTES = 60


def lines_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, li, line, lh, *carry) — the SAME 5-token line
    construction as the batch operator (split on single space, 1-based
    slice windows, space re-join), so the two forms dedup identical
    strings."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(text_col, " ").alias("toks"),
        *[F.col(c) for c in carry],
    )
    n_lines = F.ceil(F.size("toks") / F.lit(float(LINE_TOKENS))).cast("int")
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n_lines)).alias("li"),
        "toks",
        *[F.col(c) for c in carry],
    ).select(
        "doc_id",
        "li",
        F.array_join(
            F.slice(
                F.col("toks"), (F.col("li") - 1) * LINE_TOKENS + 1, LINE_TOKENS
            ),
            " ",
        ).alias("line"),
        *[F.col(c) for c in carry],
    ).withColumn("lh", F.md5("line"))


def streaming_line_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    ttl_minutes: int = DEFAULT_TTL_MINUTES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Kept-lines stream ``(doc_id, li, line)``: each distinct line's
    first occurrence within the TTL window survives, every other copy
    drops — the streaming form of ``dedup_lines_global`` (module
    docstring has the exact parity and eviction contracts). The input
    must carry ``withWatermark(ts_col, ...)``."""
    gap_us = ttl_minutes * 60 * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # TTL passed quiet: forget the line
            return
        rows = []
        last_us = 0
        for pdf in pdfs:
            ts_us = [
                int(v) // 1000
                for v in pd.to_datetime(pdf[ts_col]).astype("int64")
            ]
            if ts_us:
                last_us = max(last_us, max(ts_us))
            rows.extend(
                zip(
                    (int(x) for x in pdf["doc_id"]),
                    (int(x) for x in pdf["li"]),
                    pdf["line"],
                )
            )
        if state.exists:
            kept = []  # line already kept in an earlier batch
        else:
            # batch parity: the survivor is the (doc_id, li)-min
            # occurrence, exactly the window's row_number()=1 row
            kept = [min(rows)] if rows else []
        state.update((True,))
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max((last_us + gap_us) // 1000, wm_ms + 1))
        if kept:
            yield pd.DataFrame(kept, columns=["doc_id", "li", "line"])

    staged = lines_stream(docs, text_col, id_col, carry=(ts_col,))
    return staged.groupBy("lh").applyInPandasWithState(
        update,
        outputStructType="doc_id long, li int, line string",
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
