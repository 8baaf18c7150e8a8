"""Paragraph-level SEMANTIC dedup (round-4 verdict stretch item #9).

``dedup_span_excise`` (operators/dedup_span.py) removes byte-exact
repeated spans; boilerplate that was lightly EDITED between copies
(a year bumped in a license header, a name swapped in a template)
survives exact span matching. This operator composes the span
machinery's positional first-occurrence-survives discipline with the
embedding sign-bucket blocking of ``dedup_embedding_cosine``
(operators/dedup.py) at PARAGRAPH granularity:

1. each document's token stream is chunked into fixed 12-token
   paragraphs — the positional unit, keyed ``okey = doc_id·2²⁰ + q``
   exactly like the span exciser's occurrence keys;
2. every paragraph gets a 16-dim token-hash histogram embedding
   (dim(t) = first md5 hex digit of the token) — a deterministic
   stand-in with the same shape as a real sentence-embedding column;
3. 8 md5-derived integer hyperplanes (components 2·hex−17, odd so no
   zero component) sign-bucket the embeddings — candidate pairs come
   only from equal 8-bit buckets, never all-pairs;
4. within a bucket, a paragraph is EXCISED iff an EARLIER paragraph
   (smaller okey — the span exciser's corpus order) is a near-dup:
   cos² ≥ 0.81, evaluated as the all-integer cross-multiplication
   dot²·100 ≥ 81·‖a‖²·‖b‖², so verdicts are bit-identical across
   engines. The surviving representative reported per excised
   paragraph is the near-dup with the SMALLEST okey (map-side
   combinable ``min`` — deliberately no per-bucket window, the same
   choice dedup_span.py documents).

Because the fixture corpus has no lightly-edited paragraph pairs at
small SF, the query pins a SYNTHETIC near-dup corpus inside itself,
identically on both engines: for every 7th document, its first full
paragraph is re-attributed to a synthetic doc (id + 10 000 000) with
token 1 replaced by the literal ``edited`` — a 1-of-12-token edit that
defeats exact span dedup but not the embedding pass. The invariant
tests assert the injected copies are caught and that every excised
paragraph's representative precedes it.

Scale shape: chunking and embeddings are map-only (one row per
paragraph — linear); the signature build is a single map expression
(no row explosion); candidates come from an equi self-join on the
bucket signature whose volume is Σ_b C(n_b, 2); the rep selection is
a keyed groupBy-min plus one keyed join back. No whole-corpus window,
no CartesianProduct, no Python UDF. Reference grounding: the
reference engine (Streamer.java) has no text surface; this closes the
§2-B LLM-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import HEX, SQL_TOKENS, tokens
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

PARA_TOKENS = 12  # paragraph chunk size
MIN_PARA_TOKENS = 4  # tail fragments below this don't participate
SYN_DOC_OFFSET = 10_000_000  # injected near-dup copies live here
_N_PLANES = 8
_N_DIMS = 16
_POS_MOD = 1_048_576  # okey = doc_id * 2^20 + q

# 16-dim token-hash histogram (shared construction, per dialect below):
# dim(t) = instr(HEX, substr(md5(t), 1, 1)) - 1  in 0..15.
_SPARK_EMB = (
    "transform(sequence(0, 15), d -> CAST(size(filter("
    f"transform(para, t -> instr('{HEX}', substr(md5(t), 1, 1)) - 1),"
    " x -> x = d)) AS BIGINT))"
)
# 8-bit sign bucket: plane p component i is the ODD integer
# 2*hexval(md5('ppl<p>_<i>')) - 17; projection is pure int arithmetic.
_SPARK_BUCKET = (
    "concat_ws('', transform(sequence(0, 7), p -> CASE WHEN aggregate("
    "sequence(0, 15), 0L, (acc, i) -> acc + "
    f"(2 * instr('{HEX}', substr(md5(concat('ppl', p, '_', i)), 1, 1)) - 17)"
    " * element_at(v, CAST(i + 1 AS INT)), acc -> acc) >= 0"
    " THEN '1' ELSE '0' END))"
)


@register(
    "dedup_paragraph_semantic",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, {SQL_TOKENS} AS w FROM documents
        ),
        paras AS (
            SELECT doc_id, q,
                   list_slice(w, q * {PARA_TOKENS} + 1,
                              q * {PARA_TOKENS} + {PARA_TOKENS}) AS para
            FROM words,
                 unnest(range(0, (len(w) + {PARA_TOKENS - 1}) // {PARA_TOKENS}))
                     AS t(q)
        ),
        aug AS (
            SELECT doc_id, q, para FROM paras
            WHERE len(para) >= {MIN_PARA_TOKENS}
            UNION ALL
            SELECT doc_id + {SYN_DOC_OFFSET} AS doc_id, 0 AS q,
                   list_concat(['edited'],
                               list_slice(para, 2, {PARA_TOKENS})) AS para
            FROM paras
            WHERE q = 0 AND doc_id % 7 = 0 AND len(para) = {PARA_TOKENS}
        ),
        emb AS (
            SELECT doc_id, q, doc_id * {_POS_MOD} + q AS okey,
                   list_transform(range(0, 16), d -> CAST(len(list_filter(
                       list_transform(para,
                           t -> instr('{HEX}', substr(md5(t), 1, 1)) - 1),
                       x -> x = d)) AS BIGINT)) AS v
            FROM aug
        ),
        sig AS MATERIALIZED (
            SELECT doc_id, q, okey, v,
                   CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS n2,
                   array_to_string(list_transform(range(0, 8), p ->
                       CASE WHEN list_sum(list_transform(range(0, 16), i ->
                           (2 * instr('{HEX}',
                                substr(md5('ppl' || p || '_' || i), 1, 1)) - 17)
                           * v[CAST(i AS INT) + 1])) >= 0
                       THEN '1' ELSE '0' END), '') AS bucket
            FROM emb
        ),
        pairs AS MATERIALIZED (
            SELECT a.doc_id, a.q, a.okey,
                   b.doc_id AS rep_doc_id, b.q AS rep_q, b.okey AS rep_okey,
                   CAST(list_sum(list_transform(range(0, 16), i ->
                        a.v[CAST(i AS INT) + 1] * b.v[CAST(i AS INT) + 1]))
                        AS BIGINT) AS dt,
                   a.n2 AS n2a, b.n2 AS n2b
            FROM sig a JOIN sig b
              ON a.bucket = b.bucket AND b.okey < a.okey
            WHERE dt * dt * 100 >= 81 * a.n2 * b.n2
        ),
        mins AS (
            SELECT okey, min(rep_okey) AS rep_okey FROM pairs GROUP BY okey
        )
        SELECT p.doc_id, CAST(p.q AS BIGINT) AS para_idx,
               p.rep_doc_id, CAST(p.rep_q AS BIGINT) AS rep_para_idx,
               CAST(p.dt * p.dt * 1000000 // (p.n2a * p.n2b) AS BIGINT)
                   AS cos2_fp6
        FROM mins m JOIN pairs p
          ON p.okey = m.okey AND p.rep_okey = m.rep_okey
        ORDER BY p.doc_id, para_idx
    """,
    tags=("llm-data", "dedup", "paragraph", "embedding", "lsh"),
)
def dedup_paragraph_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excised-paragraph census: every paragraph with an earlier
    near-duplicate (cos² ≥ 0.81 on the 16-dim token-hash embedding,
    same 8-plane sign bucket), with its surviving first-occurrence
    representative and the fixed-point squared cosine of that pair.
    See module docstring for the construction and scale shape."""
    d = widen(load_table(spark, sf_dir, "documents")).select(
        "doc_id", tokens("text").alias("w")
    )
    paras = d.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                (F.floor((F.size("w") + PARA_TOKENS - 1) / PARA_TOKENS) - 1).cast(
                    "int"
                ),
            )
        ).alias("q"),
        "w",
    ).select(
        "doc_id",
        "q",
        F.slice("w", F.col("q") * PARA_TOKENS + 1, PARA_TOKENS).alias("para"),
    )
    base = paras.filter(F.size("para") >= MIN_PARA_TOKENS).select(
        "doc_id", "q", "para"
    )
    injected = (
        paras.filter(
            (F.col("q") == 0)
            & (F.col("doc_id") % 7 == 0)
            & (F.size("para") == PARA_TOKENS)
        )
        .select(
            (F.col("doc_id") + SYN_DOC_OFFSET).alias("doc_id"),
            F.lit(0).alias("q"),
            F.concat(
                F.array(F.lit("edited")), F.slice("para", 2, PARA_TOKENS - 1)
            ).alias("para"),
        )
    )
    aug = base.unionByName(injected)
    sig = aug.select(
        "doc_id",
        "q",
        (F.col("doc_id") * _POS_MOD + F.col("q")).alias("okey"),
        F.expr(_SPARK_EMB).alias("v"),
    ).select(
        "doc_id",
        "q",
        "okey",
        "v",
        F.aggregate(
            F.transform("v", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n2"),
        F.expr(_SPARK_BUCKET).alias("bucket"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    dt = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.okey") < F.col("a.okey")),
        )
        .withColumn("dt", dt)
        .filter(
            F.col("dt") * F.col("dt") * 100 >= 81 * F.col("a.n2") * F.col("b.n2")
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.q").alias("q"),
            F.col("a.okey").alias("okey"),
            F.col("b.doc_id").alias("rep_doc_id"),
            F.col("b.q").alias("rep_q"),
            F.col("b.okey").alias("rep_okey"),
            "dt",
            F.col("a.n2").alias("n2a"),
            F.col("b.n2").alias("n2b"),
        )
    )
    mins = pairs.groupBy("okey").agg(F.min("rep_okey").alias("rep_okey"))
    return (
        mins.join(pairs, ["okey", "rep_okey"])
        .select(
            "doc_id",
            F.col("q").cast("long").alias("para_idx"),
            "rep_doc_id",
            F.col("rep_q").cast("long").alias("rep_para_idx"),
            F.expr("(dt * dt * 1000000) div (n2a * n2b)").alias("cos2_fp6"),
        )
        .orderBy("doc_id", "para_idx")
    )
