"""Round-8 batch: memorization-band span examples (VERDICT r7 #2).

``dedup_memorization_ngram_report`` (relational18.py) is the cap-free
AUDIT form — count-only, so its shuffle is one row per distinct n-gram
regardless of duplication, and the high-df n-grams it surfaces are the
signal, never filtered. What a df cap buys is a different, complementary
report: once boilerplate n-grams (df > cap) are excised, each surviving
n-gram's posting list is BOUNDED (<= cap doc ids), so the report can
carry example documents — the triage artifact an engineer actually
opens ("which docs share this span?") — without any risk of a heavy key
materializing millions of ids. That is the dedup_ngram_jaccard cap
pattern (operators/dedup.py:116) applied to span reporting: the cap
bounds the tail at extreme duplication by construction.

Reference parity note: the reference engine computes nothing of this
kind (keyed integer streamer, v1/src/main/java/Stream/Streamer.java);
this belongs to the SURVEY §2 Part-B LLM-data closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import (
    SQL_TOKENS,
    shingles,
    sql_shingles,
    tokens,
)
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

_MEMO_N = 8  # n-gram length, same as the cap-free audit report
_MEMO_TOP = 50
#: n-grams in more documents than this are boilerplate, not
#: memorization candidates — excised like jaccard's stop-shingles
_MEMO_DF_CAP = 64


@register(
    "dedup_memorization_span_examples",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, {SQL_TOKENS} AS w FROM documents
        ),
        posting AS (
            SELECT doc_id, unnest({sql_shingles("w", _MEMO_N)}) AS s
            FROM tok
        ),
        dfreq AS (
            SELECT s, count(*) AS df FROM posting GROUP BY s
        ),
        band AS (
            SELECT s, CAST(df AS BIGINT) AS n_docs FROM dfreq
            WHERE df BETWEEN 2 AND {_MEMO_DF_CAP}
        ),
        ex AS (
            SELECT b.s AS ngram, b.n_docs,
                   list_sort(list(p.doc_id)) AS ids
            FROM posting p JOIN band b ON p.s = b.s
            GROUP BY b.s, b.n_docs
        )
        SELECT ngram, n_docs,
               CAST(ids[1] AS BIGINT) AS ex1,
               CAST(ids[2] AS BIGINT) AS ex2,
               CAST(ids[3] AS BIGINT) AS ex3
        FROM ex ORDER BY n_docs DESC, ngram LIMIT {_MEMO_TOP}
    """,
    tags=("llm-data", "dedup", "text", "audit"),
)
def dedup_memorization_span_examples(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Memorization-band {_MEMO_N}-gram spans WITH example documents:
    word {_MEMO_N}-grams shared by 2..{_MEMO_DF_CAP} distinct docs
    (above the cap = boilerplate — license blocks, headers — excised
    exactly like dedup_ngram_jaccard's stop-shingles), top {_MEMO_TOP}
    by document frequency, each with its three lowest sharing doc ids.

    The df cap is what makes the example columns safe: every surviving
    n-gram's collected id set is <= {_MEMO_DF_CAP} entries by
    construction, so no heavy key ever materializes an unbounded list —
    the cap-free companion (dedup_memorization_ngram_report) stays
    count-only for exactly that reason.

    Plan shape: the posting explode is map-side and persisted for its
    two consumers; df counts aggregate with map-side combine (one row
    per distinct n-gram); the boilerplate set (df > cap) is small by
    construction and removed with a BROADCAST anti-join, so the posting
    list is never shuffled for the cap; the final per-n-gram aggregate
    shuffles <= cap rows per key, and the report is a TakeOrdered
    top-k.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    posting = d.select(
        "doc_id",
        F.explode(shingles(tokens("text"), _MEMO_N)).alias("s"),
    ).persist()
    stop = (
        posting.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _MEMO_DF_CAP)
        .select("s")
    )
    banded = posting.join(F.broadcast(stop), "s", "left_anti")
    agg = (
        banded.groupBy(F.col("s").alias("ngram"))
        .agg(
            # shingles() is per-doc DISTINCT, so count(*) == doc
            # frequency; the id set is <= _MEMO_DF_CAP by the cap
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sort_array(F.collect_set("doc_id")).alias("ids"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return (
        agg.select(
            "ngram",
            "n_docs",
            F.get("ids", 0).cast("long").alias("ex1"),
            F.get("ids", 1).cast("long").alias("ex2"),
            F.get("ids", 2).cast("long").alias("ex3"),
        )
        .orderBy(F.desc("n_docs"), "ngram")
        .limit(_MEMO_TOP)
    )
