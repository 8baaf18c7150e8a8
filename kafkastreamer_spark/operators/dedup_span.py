"""Span-level substring dedup (round-3 verdict item #2).

Document-level dedup (operators/dedup.py) removes whole near-identical
documents; a pretraining corpus additionally carries duplicated
*spans* — license blocks, boilerplate headers, quoted passages —
inside otherwise-distinct documents. Lee et al. ("Deduplicating
Training Data Makes Language Models Better", ACL 2022) excise any
≥50-token substring occurring twice, keeping one occurrence, via a
corpus-wide suffix array. A suffix array is a single global structure
with no natural Spark decomposition; the shingle-index formulation
below reaches the same fixed point for span length ≥ K with only
linear, well-partitioned primitives:

1. every K-token window of every document is a *positional* shingle
   occurrence ``(doc_id, p, sh)`` — a duplicated span of length
   L ≥ K is exactly a run of L-K+1 duplicated shingles;
2. per-shingle stats: total count and the corpus-wide FIRST occurrence
   under (doc_id, position) order, encoded as ``min(doc_id·2²⁰ + p)``
   — a plain map-side-combinable ``min``, deliberately NOT a
   ``row_number() OVER (PARTITION BY sh)`` window, which would
   single-task-sort the hot boilerplate shingles this operator exists
   to find;
3. every non-first occurrence of a repeated shingle marks its K token
   positions covered; covered positions are excised and the document
   re-assembled in order.

Every kept span is therefore corpus-unique (invariant-tested), the
first occurrence of each duplicated span survives verbatim, and
intra-document repetition dedups the same way. The whole pipeline is
exact integer/string arithmetic — the DuckDB oracle mirrors it
operation for operation.

Scale shape: the occurrence table is one row per token — linear. The
per-shingle aggregate map-side combines to |distinct shingles| rows.
The stats join back is an equi join whose hot keys (high-df
boilerplate shingles) AQE skew-splits; the reassembly groupBy
shuffles (pos, token) pairs once per doc. Reference grounding: the
reference engine (Streamer.java) has no text surface at all; this
serves the §2-B LLM-pipeline closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import SQL_TOKENS, tokens
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

SPAN_K = 5  # minimum duplicated-span length, in tokens
_POS_BITS = 20  # okey = doc_id << 20 | p : positions must fit 2^20

_SQL_SH = "||' '||".join(f"w[i+{j}]" for j in range(SPAN_K))


@register(
    "dedup_span_excise",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, {SQL_TOKENS} AS w FROM documents
        ),
        occ AS (
            SELECT doc_id, i AS p, {_SQL_SH} AS sh,
                   doc_id * 1048576 + i AS okey
            FROM words, unnest(range(1, len(w) - {SPAN_K} + 2)) AS t(i)
        ),
        stats AS (SELECT sh, count(*) AS cnt, min(okey) AS mk FROM occ GROUP BY sh),
        dupocc AS (
            SELECT o.doc_id, o.p FROM occ o JOIN stats s ON o.sh = s.sh
            WHERE s.cnt > 1 AND o.okey <> s.mk
        ),
        covered AS (
            SELECT DISTINCT doc_id, pos
            FROM dupocc, unnest(range(p, p + {SPAN_K})) AS u(pos)
        ),
        toks AS (
            SELECT doc_id, i AS pos, w[i] AS tok
            FROM words, unnest(range(1, len(w) + 1)) AS t(i)
        ),
        kept AS (
            SELECT t.doc_id, t.pos, t.tok FROM toks t
            ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
        ),
        per AS (
            SELECT doc_id, count(*) AS n_kept,
                   string_agg(tok, ' ' ORDER BY pos) AS text_clean
            FROM kept GROUP BY doc_id
        ),
        base AS (SELECT doc_id, len(w) AS n_tokens FROM words)
        SELECT b.doc_id, b.n_tokens,
               b.n_tokens - coalesce(p.n_kept, 0) AS n_removed,
               coalesce(p.text_clean, '') AS text_clean
        FROM base b LEFT JOIN per p USING (doc_id)
        ORDER BY b.doc_id
    """,
    tags=("llm-data", "dedup", "span"),
)
def dedup_span_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excise duplicated ≥K-token spans corpus-wide, keeping the first
    occurrence (by doc_id, then position) verbatim — the span-level
    companion to the document-level dedup family. Output: every
    document with its original token count, the number of excised
    tokens, and the cleaned text (tokens re-joined in order;
    empty string when an exact-duplicate document loses everything).
    See the module docstring for the algorithm and its 100 TB shape.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    words = d.select("doc_id", tokens("text").alias("w")).persist()

    p = F.col("p")
    occ = words.select(
        "doc_id",
        F.col("w"),
        F.explode(
            F.when(
                F.size("w") >= SPAN_K,
                F.sequence(F.lit(1), F.size("w") - SPAN_K + 1),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("p"),
    ).select(
        "doc_id",
        "p",
        F.concat_ws(" ", F.slice(F.col("w"), p, SPAN_K)).alias("sh"),
        (F.col("doc_id") * (1 << _POS_BITS) + p).alias("okey"),
    )
    stats = occ.groupBy("sh").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("okey").alias("mk")
    )
    dupocc = (
        occ.join(stats, "sh")
        .filter((F.col("cnt") > 1) & (F.col("okey") != F.col("mk")))
        .select("doc_id", "p")
    )
    covered = dupocc.select(
        "doc_id", F.explode(F.sequence(p, p + SPAN_K - 1)).alias("pos")
    ).distinct()
    toks = words.select(
        "doc_id", F.posexplode("w").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    per = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("text_clean"),
    )
    base = words.select("doc_id", F.size("w").cast("long").alias("n_tokens"))
    return (
        base.join(per, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
        .orderBy("doc_id")
    )
