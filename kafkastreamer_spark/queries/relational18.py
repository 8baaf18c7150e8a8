"""Round-7 batch 226: training-corpus planning + embedding QA.

Four operators a 100 TB pretraining-data pipeline runs between
cleaning and training, none previously in the registry:

- ``embedding_isotropy_audit`` — the mean pairwise cosine of an
  embedding collection in ONE aggregation pass (no pair join):
  for unit vectors, sum_{i != j} cos(i,j) = ||sum_i v_i||^2 - n,
  so the all-pairs mean collapses to a per-dimension sum — the
  identity that makes embedding-quality auditing feasible at corpus
  scale (an anisotropic/collapsed embedding space is the classic
  silent failure of representation pipelines).
- ``dedup_memorization_ngram_report`` — cross-document repeated
  8-gram inventory (the memorization-risk audit of Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better": text
  repeated across documents is what models regurgitate).
- ``sample_epoch_mixture_schedule`` — per-source token-budget
  schedule: temperature-weighted (alpha=0.5) target tokens and the
  implied epoch/repeat factor per source — the sampling-proportions
  table every pretraining run publishes.
- ``ml_mrr_at_k`` — mean-reciprocal-rank companion of
  ``ml_ndcg_at_k`` over the same supplier-ranking fixture (MRR is
  the retrieval-eval metric NDCG doesn't subsume: position of the
  single best item only).

Reference parity note: the reference engine computes none of these
(it is a keyed integer streamer, v1/src/main/java/Stream/
Streamer.java:264-282); they belong to the SURVEY §2 Part-B
LLM-data-pipeline closure, same family as operators/sampling.py and
operators/similarity.py.

Determinism discipline as everywhere else: every compared column is
BIGINT; doubles appear only in per-row/per-group IEEE-exact spots
(sqrt of an exact integer, one multiply) and are floored to fixed
point before any cross-row combination; integer quotients use
Spark ``div`` / DuckDB ``//``, which both truncate toward zero, so
negative numerators (possible for isotropy) also match.
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

_ISO_SCALE = 1000  # unit-vector component quantization (exact in BIGINT)
_MEMO_N = 8  # n-gram length for the memorization audit
_MEMO_TOP = 50
_MIX_BUDGET = 1_000_000  # token budget the schedule allocates
_MRR_K = 10


@register(
    "embedding_isotropy_audit",
    oracle=f"""
        WITH e AS (
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        q AS (
            SELECT label,
                   list_transform(v, x -> CAST(floor(
                       x / sqrt(list_dot_product(v, v)) * {_ISO_SCALE})
                       AS BIGINT)) AS q
            FROM e WHERE list_dot_product(v, v) > 0
        ),
        selfsq AS (
            SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(sum(list_sum(list_transform(q, x -> x * x)))
                        AS BIGINT) AS ssq
            FROM q GROUP BY label
        ),
        dims AS (
            SELECT label, d, CAST(sum(q[CAST(d AS INT)]) AS BIGINT) AS s
            FROM q, (SELECT unnest(range(1, 65)) AS d)
            GROUP BY label, d
        ),
        norms AS (
            SELECT label, CAST(sum(s * s) AS BIGINT) AS normsq
            FROM dims GROUP BY label
        )
        SELECT s.label AS label, s.n_vecs,
               (10000 * (n.normsq - s.ssq))
                   // (s.n_vecs * (s.n_vecs - 1) * {_ISO_SCALE * _ISO_SCALE})
                   AS mean_cos_fp4
        FROM selfsq s JOIN norms n ON n.label = s.label
        WHERE s.n_vecs >= 2
        ORDER BY label
    """,
    tags=("llm-data", "embedding", "audit"),
)
def embedding_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean pairwise cosine WITHOUT a pair join: for
    quantized unit vectors q, sum_{i!=j} q_i.q_j = ||sum q||^2 -
    sum ||q||^2, so the audit is one 64-way posexplode + two keyed
    aggregates. A healthy isotropic space reads near 0; a collapsed
    one reads near 10000 (fp4) — the one-pass replacement for the
    O(n^2) random-pair probe.

    Components quantize to BIGINT at scale 1000 before ANY cross-row
    sum, so both engines combine exact integers
    in any order (the doubles — one sqrt, one divide per component —
    are per-row IEEE-exact). The reported value is the exact mean
    cosine OF THE QUANTIZED vectors; quantization error is < 1e-2 on
    a 64-dim unit vector, well under the fp4 report grain.

    Scale: the explode is map-side and collapses to |labels| x 64
    rows via partial aggregation before the shuffle; per-dimension
    sums bound the working set by labels x dims regardless of corpus
    size. Overflow headroom: |S_d| <= n x {_ISO_SCALE}, so normsq fits
    BIGINT up to n ~ 3e6 per label at this scale; larger corpora
    lower _ISO_SCALE or sum per-shard then combine (the identity is
    associative).
    """
    e = widen(load_table(spark, sf_dir, "embeddings")).select(
        F.col("label").cast("long").alias("label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    dotvv = F.aggregate(
        F.zip_with("v", "v", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    q = e.withColumn("_dot", dotvv).filter(F.col("_dot") > 0).select(
        "label",
        F.transform(
            "v",
            lambda x: F.floor(x / F.sqrt(F.col("_dot")) * _ISO_SCALE),
        ).alias("q"),
    )
    selfsq = q.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(
            F.aggregate(
                F.transform("q", lambda x: x * x),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        )
        .cast("long")
        .alias("ssq"),
    )
    dims = (
        q.select("label", F.posexplode("q").alias("d", "qd"))
        .groupBy("label", "d")
        .agg(F.sum("qd").cast("long").alias("s"))
    )
    norms = dims.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).cast("long").alias("normsq")
    )
    return (
        selfsq.join(norms, "label")
        .filter(F.col("n_vecs") >= 2)
        .select(
            "label",
            "n_vecs",
            F.expr(
                "(10000 * (normsq - ssq)) div "
                f"(n_vecs * (n_vecs - 1) * {_ISO_SCALE * _ISO_SCALE})"
            ).alias("mean_cos_fp4"),
        )
        .orderBy("label")
    )


@register(
    "dedup_memorization_ngram_report",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, {SQL_TOKENS} AS w FROM documents
        ),
        posting AS (
            SELECT doc_id, unnest({sql_shingles("w", _MEMO_N)}) AS s
            FROM tok
        ),
        rep AS (
            SELECT s AS ngram,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(min(doc_id) AS BIGINT) AS rep_doc
            FROM posting GROUP BY s
            HAVING count(*) >= 2
        )
        SELECT ngram, n_docs, rep_doc FROM rep
        ORDER BY n_docs DESC, ngram LIMIT {_MEMO_TOP}
    """,
    tags=("llm-data", "dedup", "text", "audit"),
)
def dedup_memorization_ngram_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-document repeated {_MEMO_N}-gram inventory — the
    memorization-risk audit (Lee et al. 2022): word {_MEMO_N}-grams
    appearing in >= 2 distinct documents, top {_MEMO_TOP} by document
    frequency with the n-gram text itself as the total-order
    tie-break. Distinct from dedup_ngram_jaccard (pairwise doc
    similarity) and text_top_bigrams (raw frequency): this surfaces
    the SPANS that survive doc-level dedup and end up memorized.

    This is deliberately the CAP-FREE audit form (VERDICT r7 #2
    resolution): the high-df n-grams a df cap would excise are the
    memorization signal itself, and the aggregate carries only a
    count and a min — one shuffle row per distinct n-gram regardless
    of duplication, so no cap is needed for boundedness. Cost is
    linear in posting volume by design (measured: 6.8x wall at 16x
    copy-inflation, 26.7x at 64x — approaching linear as fixed
    overhead amortizes; docs/SCALING.md). The df-capped companion
    is dedup_memorization_span_examples (relational19.py), where the
    cap bounds per-n-gram id lists so example docs can be carried.

    Scale: shingling is map-side (array_distinct per doc bounds a
    doc's contribution); the groupBy on the n-gram hash-distributes
    with map-side combine, and the report is a TakeOrdered top-k —
    no join, no window. The heavy-hitter n-grams are exactly the
    skewed keys, but they only ever accumulate a count, never a
    list.
    """
    # widen(): the fixture is one parquet file -> one scan partition,
    # which would serialize the (expensive) 8-gram shingle build on a
    # single core; on real multi-file storage it is a no-op.
    d = widen(load_table(spark, sf_dir, "documents"))
    posting = d.select(
        "doc_id",
        F.explode(shingles(tokens("text"), _MEMO_N)).alias("s"),
    )
    return (
        posting.groupBy(F.col("s").alias("ngram"))
        .agg(
            # shingles() is per-doc DISTINCT, so every (doc, ngram)
            # posting is unique and count(*) == count(DISTINCT doc) —
            # a plain count map-side-combines; an exact count-distinct
            # would expand to a two-phase distinct aggregation.
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("rep_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), "ngram")
        .limit(_MEMO_TOP)
    )


@register(
    "sample_epoch_mixture_schedule",
    oracle=f"""
        WITH tok AS (
            SELECT source, CAST(len({SQL_TOKENS}) AS BIGINT) AS nt
            FROM documents
        ),
        src AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens
            FROM tok GROUP BY source
        ),
        wts AS (
            SELECT source, n_docs, n_tokens,
                   CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 10000)
                        AS BIGINT) AS w_fp4
            FROM src
        ),
        tot AS (SELECT CAST(sum(w_fp4) AS BIGINT) AS w_tot FROM wts)
        SELECT source, n_docs, n_tokens, w_fp4,
               ({_MIX_BUDGET} * w_fp4) // w_tot AS target_tokens,
               (10000 * (({_MIX_BUDGET} * w_fp4) // w_tot)) // n_tokens
                   AS epochs_fp4
        FROM wts CROSS JOIN tot
        ORDER BY source
    """,
    tags=("llm-data", "sampling", "training-data"),
)
def sample_epoch_mixture_schedule(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source token-budget schedule: allocate a {_MIX_BUDGET}-token
    training budget across sources proportionally to
    sqrt(source tokens) (temperature alpha=0.5 — the multilingual
    upweighting of tail sources), and report the implied epoch factor
    (target/available, fp4; > 10000 means the source repeats) — the
    published sampling-proportions table of every pretraining mix,
    and the planning COMPANION of sample_temperature_mix (which
    materializes a doc subsample; this prices the whole mixture).

    Cross-source normalization sums the per-source
    floor(sqrt(tokens)*1e4) FIXED-POINT weights as BIGINTs — never
    doubles across groups — so the total and every quotient are exact
    in both engines (sqrt of an exact integer is IEEE
    correctly-rounded, one per source).

    Scale: one token-count scan (map-only), one |sources|-row
    aggregate, and a broadcast of the 1-row total — the scan
    dominates; everything after it is dimension-sized.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    src = (
        d.select("source", F.size(tokens("text")).cast("long").alias("nt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
    )
    wts = src.withColumn(
        "w_fp4",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 10000).cast("long"),
    )
    tot = wts.agg(F.sum("w_fp4").cast("long").alias("w_tot"))
    return (
        wts.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "w_fp4",
            F.expr(f"({_MIX_BUDGET} * w_fp4) div w_tot").alias("target_tokens"),
            F.expr(
                f"(10000 * (({_MIX_BUDGET} * w_fp4) div w_tot)) div n_tokens"
            ).alias("epochs_fp4"),
        )
        .orderBy("source")
    )


@register(
    "ml_mrr_at_k",
    oracle=f"""
        WITH rev AS (
            SELECT n.n_name AS nation, s.s_suppkey,
                   CAST(coalesce(sum(CASE WHEN year(CAST(l.l_shipdate
                            AS DATE)) = 1995 THEN
                        CAST(FLOOR((l.l_extendedprice
                            * (1 - l.l_discount)) * 10000) AS BIGINT)
                        END), 0) AS BIGINT) AS rev95_fp4,
                   CAST(coalesce(sum(CASE WHEN year(CAST(l.l_shipdate
                            AS DATE)) = 1996 THEN
                        CAST(FLOOR((l.l_extendedprice
                            * (1 - l.l_discount)) * 10000) AS BIGINT)
                        END), 0) AS BIGINT) AS rev96_fp4
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey
                 AND year(CAST(l.l_shipdate AS DATE)) IN (1995, 1996)
            GROUP BY n.n_name, s.s_suppkey
        ),
        ranked AS (
            SELECT nation, s_suppkey,
                   CAST(row_number() OVER (PARTITION BY nation
                        ORDER BY rev95_fp4 DESC, s_suppkey) AS BIGINT)
                       AS pred_rank,
                   CAST(row_number() OVER (PARTITION BY nation
                        ORDER BY rev96_fp4 DESC, s_suppkey) AS BIGINT)
                       AS ar
            FROM rev
        )
        SELECT nation,
               CAST(s_suppkey AS BIGINT) AS best_suppkey,
               pred_rank AS pred_rank_of_best,
               CASE WHEN pred_rank <= {_MRR_K}
                    THEN 10000 // pred_rank ELSE CAST(0 AS BIGINT)
               END AS rr_fp4
        FROM ranked WHERE ar = 1
        ORDER BY nation
    """,
    tags=("ml-metrics", "ranking"),
)
def ml_mrr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank @{_MRR_K} of the single best item — the
    retrieval-eval companion of ml_ndcg_at_k on the same fixture
    (nation suppliers ranked by 1995 revenue, graded by realized
    1996 revenue): where did the ACTUAL best-1996 supplier land in
    the predicted order? rr_fp4 = 10000 // pred_rank (0 beyond k) is
    an exact integer; averaging across nations is the consumer's
    one division.

    Scale shape matches ml_ndcg_at_k: one fact-sized conditional
    aggregate, then two supplier-dim windows per nation.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from kafkastreamer_spark.queries._util import fixed

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    li_y = li.withColumn("yr", F.year(F.to_date("l_shipdate"))).filter(
        F.col("yr").isin(1995, 1996)
    )
    rev_fp = fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    base = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(li_y, li_y.l_suppkey == s.s_suppkey, "left")
        .groupBy(F.col("n_name").alias("nation"), "s_suppkey")
        .agg(
            F.coalesce(F.sum(F.when(F.col("yr") == 1995, rev_fp)), F.lit(0))
            .cast("long")
            .alias("rev95_fp4"),
            F.coalesce(F.sum(F.when(F.col("yr") == 1996, rev_fp)), F.lit(0))
            .cast("long")
            .alias("rev96_fp4"),
        )
    )
    wp = Window.partitionBy("nation").orderBy(F.desc("rev95_fp4"), "s_suppkey")
    wa = Window.partitionBy("nation").orderBy(F.desc("rev96_fp4"), "s_suppkey")
    ranked = base.select(
        "nation",
        "s_suppkey",
        F.row_number().over(wp).cast("long").alias("pred_rank"),
        F.row_number().over(wa).cast("long").alias("ar"),
    )
    return (
        ranked.filter(F.col("ar") == 1)
        .select(
            "nation",
            F.col("s_suppkey").cast("long").alias("best_suppkey"),
            F.col("pred_rank").alias("pred_rank_of_best"),
            F.when(
                F.col("pred_rank") <= _MRR_K,
                F.expr("10000 div pred_rank"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rr_fp4"),
        )
        .orderBy("nation")
    )
