"""Round-9 batch 229: corpus-DAG certification, prefix-boilerplate
dedup, binary-embedding ANN recall, DP sensitivity audit.

Four genuinely new shapes for the SURVEY §2 Part-B / north-star
closure:

* ``pipeline_corpus_dag_cert`` — the round-9 DAG-shaped corpus
  topology compiler (plans/corpus_dag.py, VERDICT r8 stretch #8)
  certified end-to-end against an independent SQL oracle, the same
  discipline pipeline_corpus_topology applies to the linear compiler.
* ``dedup_prefix_ladder`` — boilerplate-PREFIX detection (shared
  headers, license preambles, scraped template openings) at a
  power-of-two prefix-length ladder; the report exact dedup cannot
  produce because whole-text hashing sees each header+unique-body doc
  as distinct.
* ``embedding_binary_hamming_recall`` — 1-bit-per-dimension binary
  quantization of the embedding column with a measured recall@k
  against the exact cosine ranking: the third ANN family next to IVF
  (similarity_ivf_probe) and MinHash-LSH, and the one whose candidate
  metric is pure integer ops (xor + popcount over two 32-bit words).
* ``governance_dp_sensitivity_audit`` — user-level L1 sensitivity of
  a released (event_type, day) count histogram plus an exact
  contribution-clipping ladder: the privacy-budget planning table a
  DP release of training-data statistics starts from, joining the
  k-anonymity / l-diversity / t-closeness battery.

Reference parity note: the reference engine computes nothing of this
kind (keyed integer streamer, v1/src/main/java/Stream/Streamer.java);
these belong to the SURVEY §2 Part-B LLM-data/governance closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import cosine
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# pipeline_corpus_dag_cert
# ---------------------------------------------------------------------------

#: the 2-branch fan-out/fan-in hygiene DAG the compiler is certified
#: on: one intake read by a quality branch (gopher -> length >= 60
#: tokens) and a dedup branch (exact_dedup -> length >= 120 tokens),
#: fan-in union into one corpus sink. Branch survivors are kept with
#: UNION ALL semantics (a doc passing both branches is two rows) —
#: that is what unionByName does and what the per-source rollup must
#: therefore count.
_CERT_DAG = {
    "stream_id": "cert-dag",
    "sinks": ["corpus"],
    "nodes": [
        {"name": "intake", "operation": "source"},
        {"name": "gq", "operation": "gopher_gate", "inputs": ["intake"]},
        {"name": "ga", "operation": "length_gate", "arg": 60, "inputs": ["gq"]},
        {"name": "dd", "operation": "exact_dedup", "inputs": ["intake"]},
        {"name": "db", "operation": "length_gate", "arg": 120, "inputs": ["dd"]},
        {"name": "corpus", "operation": "union", "inputs": ["ga", "db"]},
    ],
}


@register(
    "pipeline_corpus_dag_cert",
    oracle="""
        WITH tok AS (
            SELECT doc_id, source, text,
                   string_split_regex(lower(text), '\\s+') AS w
            FROM documents
        ),
        f AS (
            SELECT doc_id, source, text, w,
                   CAST(len(w) AS BIGINT) AS n_words,
                   CAST(list_sum(list_transform(w, t -> len(t))) AS BIGINT)
                       AS total_chars,
                   CAST(len(list_filter(w,
                        t -> t IN ('the','a','and','of','to'))) AS BIGINT)
                       AS n_stop,
                   CAST(len(list_filter(w,
                        t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS n_alpha
            FROM tok
        ),
        ga AS (
            SELECT doc_id, source FROM f
            WHERE n_words BETWEEN 50 AND 100000
              AND total_chars >= n_words * 3
              AND total_chars <= n_words * 10
              AND n_stop >= 2
              AND n_alpha * 10 >= n_words * 8
              AND len(w) >= 60
        ),
        dd AS (
            SELECT doc_id, source, w FROM (
                SELECT doc_id, source, w,
                       ROW_NUMBER() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) AS rn
                FROM tok
            ) WHERE rn = 1
        ),
        db AS (SELECT doc_id, source FROM dd WHERE len(w) >= 120),
        corpus AS (
            SELECT * FROM ga UNION ALL SELECT * FROM db
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM corpus GROUP BY source ORDER BY source
    """,
    tags=("pipeline", "topology", "dag", "llm-data"),
)
def pipeline_corpus_dag_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source survivor rollup of the DECLARATIVE 2-branch corpus
    DAG (fan-out from one intake, fan-in union), executed through the
    corpus-DAG compiler — certifying plans/corpus_dag.py's
    validation + shared-subplan compilation end-to-end against an
    independent SQL oracle, exactly as pipeline_corpus_topology
    certifies the linear compiler.

    n_rows counts UNION ALL branch survivors (a doc passing both
    branches contributes twice); n_docs is the distinct count — their
    difference is the fan-in overlap, which is what makes the rollup
    sensitive to the compiler wiring (a compiler that deduplicated
    the union, or built the shared intake subplan twice with
    different column pruning, changes the numbers).

    Scale shape: the compiled DAG is ONE Catalyst plan — both
    branches read the same scan node, gopher flags and token counts
    are map-side codegen, the dedup branch is one hash-partitioned
    row_number on md5(text), and the rollup aggregates counts only.
    """
    from kafkastreamer_spark.plans.corpus_dag import (
        compile_corpus_dag,
        corpus_dag_from_dict,
    )

    spec = corpus_dag_from_dict(_CERT_DAG)
    docs = widen(load_table(spark, sf_dir, "documents"))
    corpus = compile_corpus_dag(spec)({"intake": docs})["corpus"]
    return (
        corpus.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# dedup_prefix_ladder
# ---------------------------------------------------------------------------

_PREFIX_LEVELS = (64, 128, 256, 512)


@register(
    "dedup_prefix_ladder",
    oracle=f"""
        WITH lv AS (SELECT unnest([{", ".join(str(x) for x in _PREFIX_LEVELS)}]) AS l),
        h AS (
            SELECT lv.l, md5(substr(d.text, 1, lv.l)) AS ph, md5(d.text) AS fh
            FROM documents d CROSS JOIN lv
            WHERE length(d.text) >= lv.l
        ),
        g AS (
            SELECT l, ph, count(*) AS n, count(DISTINCT fh) AS nfull
            FROM h GROUP BY l, ph
        )
        SELECT CAST(l AS BIGINT) AS prefix_len,
               CAST(count(*) FILTER (WHERE n > 1) AS BIGINT) AS n_groups,
               CAST(COALESCE(sum(n) FILTER (WHERE n > 1), 0) AS BIGINT)
                   AS n_docs_in_groups,
               CAST(COALESCE(sum(n - 1) FILTER (WHERE n > 1), 0) AS BIGINT)
                   AS n_excess,
               CAST(count(*) FILTER (WHERE n > 1 AND nfull > 1) AS BIGINT)
                   AS n_template_groups
        FROM g GROUP BY l ORDER BY prefix_len
    """,
    tags=("llm-data", "dedup", "text"),
)
def dedup_prefix_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix report at a power-of-two prefix-length
    ladder: for each L in {_PREFIX_LEVELS}, how many groups of
    documents share their first L characters, how many documents sit
    in those groups, the removable excess, and — the template signal —
    how many of those groups contain MORE than one distinct full
    text (shared header + unique body: invisible to whole-text exact
    dedup, which is precisely why this report exists; groups where
    nfull == 1 are plain exact duplicates already handled by
    dedup_exact).

    Docs shorter than L are excluded at that level (their "prefix" is
    the whole document — exact-dedup domain, not prefix-boilerplate).

    Scale shape: one scan, a <= {len(_PREFIX_LEVELS)}x map-side
    explode of (level, prefix-hash, full-hash) triples — hashes, never
    text, cross the exchange — then two count-only aggregations with
    map-side combine. Linear in corpus size; no joins.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    h = (
        d.select(
            "text",
            F.explode(
                F.array(*[F.lit(x) for x in _PREFIX_LEVELS])
            ).alias("l"),
        )
        .filter(F.length("text") >= F.col("l"))
        .select(
            "l",
            F.md5(F.expr("substr(text, 1, l)")).alias("ph"),
            F.md5("text").alias("fh"),
        )
    )
    g = h.groupBy("l", "ph").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("fh").alias("nfull"),
    )
    dup = F.col("n") > 1
    return (
        g.groupBy(F.col("l").cast("long").alias("prefix_len"))
        .agg(
            F.count_if(dup).cast("long").alias("n_groups"),
            F.coalesce(
                F.sum(F.when(dup, F.col("n"))), F.lit(0)
            ).cast("long").alias("n_docs_in_groups"),
            F.coalesce(
                F.sum(F.when(dup, F.col("n") - 1)), F.lit(0)
            ).cast("long").alias("n_excess"),
            F.count_if(dup & (F.col("nfull") > 1))
            .cast("long")
            .alias("n_template_groups"),
        )
        .orderBy("prefix_len")
    )


# ---------------------------------------------------------------------------
# embedding_binary_hamming_recall
# ---------------------------------------------------------------------------

_BH_SEEDS = 10  # vec_id < 10 are the query vectors (similarity.py convention)
_BH_K = 10

# sign-bit packing: bit i of word0 = (v[i] >= 0) for dims 0..31,
# word1 for dims 32..63. Two 32-bit halves in BIGINTs — never bit 63,
# so no sign-overflow subtleties on either engine. shiftleft with a
# non-literal bit count is SQL-expression-only in Spark (the Python
# DSL F.shiftleft takes a literal), hence F.expr.
_BH_PACK_SPARK = (
    "aggregate(sequence({lo}, {hi}), 0L,"
    " (acc, i) -> acc + if(element_at(v, i + 1) >= 0D,"
    " shiftleft(1L, i - {lo}), 0L))"
)
_BH_PACK_SQL = (
    "list_sum(list_transform(range({lo}, {hi} + 1),"
    " i -> CASE WHEN v[i + 1] >= 0 THEN (1::BIGINT << (i - {lo}))"
    " ELSE 0::BIGINT END))"
)


@register(
    "embedding_binary_hamming_recall",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
            FROM embeddings
        ),
        p AS (
            SELECT vec_id, v, label,
                   {_BH_PACK_SQL.format(lo=0, hi=31)} AS w0,
                   {_BH_PACK_SQL.format(lo=32, hi=63)} AS w1
            FROM e
        ),
        q AS (
            SELECT vec_id AS query_id, v AS qv, w0 AS qw0, w1 AS qw1
            FROM p WHERE vec_id < {_BH_SEEDS}
        ),
        scored AS (
            SELECT q.query_id, p.vec_id AS neighbor_id,
                   bit_count(xor(q.qw0, p.w0))
                       + bit_count(xor(q.qw1, p.w1)) AS ham,
                   list_dot_product(q.qv, p.v)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(p.v, p.v))) AS c
            FROM q JOIN p ON p.vec_id != q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, ham,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY ham, neighbor_id) AS rh,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY c DESC, neighbor_id) AS rc
            FROM scored
        )
        SELECT query_id,
               CAST(count(*) FILTER (WHERE rh <= {_BH_K} AND rc <= {_BH_K})
                    AS BIGINT) AS n_overlap,
               CAST(min(ham) AS BIGINT) AS best_ham
        FROM ranked GROUP BY query_id ORDER BY query_id
    """,
    tags=("llm-data", "similarity", "quantization"),
)
def embedding_binary_hamming_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binary-quantized ANN with a measured recall audit: embeddings
    collapse to one sign bit per dimension (64 dims -> two 32-bit
    words), candidates rank by hamming distance (xor + popcount —
    pure integer ops), and the report counts, per query vector, how
    many of the hamming top-{_BH_K} also sit in the exact-cosine
    top-{_BH_K} (ties on neighbor id, both engines). This is the
    1-bit extreme of the quantization family
    (embedding_int8_quantization_audit, embedding_pq_assign) wired to
    a recall measurement, the decision table for "can the first-pass
    retriever run on packed bits?".

    Scale shape: packing is one map-side codegen pass (32x storage
    reduction — at 100 TB the packed table is the only thing the
    first pass scans); the fixed seed set broadcasts; scoring streams
    the corpus once with no shuffle; per-query ranking exchanges only
    (query, neighbor, ham, cosine) quadruples, partitioned by
    query_id. The hamming metric itself is two xors + two popcounts
    per pair — SIMD-friendly JVM intrinsics, no floating point.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    p = e.select(
        "vec_id",
        "v",
        F.expr(_BH_PACK_SPARK.format(lo=0, hi=31)).alias("w0"),
        F.expr(_BH_PACK_SPARK.format(lo=32, hi=63)).alias("w1"),
    )
    q = p.filter(F.col("vec_id") < _BH_SEEDS).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    scored = p.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            F.bit_count(F.col("qw0").bitwiseXOR(F.col("w0")))
            + F.bit_count(F.col("qw1").bitwiseXOR(F.col("w1")))
        ).cast("long").alias("ham"),
        cosine(F.col("qv"), F.col("v")).alias("c"),
    )
    wh = Window.partitionBy("query_id").orderBy("ham", "neighbor_id")
    wc = Window.partitionBy("query_id").orderBy(F.desc("c"), "neighbor_id")
    ranked = scored.select(
        "query_id",
        "ham",
        F.row_number().over(wh).alias("rh"),
        F.row_number().over(wc).alias("rc"),
    )
    return (
        ranked.groupBy("query_id")
        .agg(
            F.count_if((F.col("rh") <= _BH_K) & (F.col("rc") <= _BH_K))
            .cast("long")
            .alias("n_overlap"),
            F.min("ham").cast("long").alias("best_ham"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# governance_dp_sensitivity_audit
# ---------------------------------------------------------------------------

_DP_CLIPS = (1, 2, 4, 8, 16)


@register(
    "governance_dp_sensitivity_audit",
    oracle=f"""
        WITH cells AS (
            SELECT user_id, event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id, event_type, day
        ),
        clips AS (SELECT unnest([{", ".join(str(c) for c in _DP_CLIPS)}]) AS clip),
        clipped AS (
            SELECT c.clip, cells.user_id,
                   sum(LEAST(cells.cnt, c.clip)) AS kept_u,
                   sum(cells.cnt - LEAST(cells.cnt, c.clip)) AS dropped_u
            FROM cells CROSS JOIN clips c
            GROUP BY c.clip, cells.user_id
        )
        SELECT CAST(clip AS BIGINT) AS clip,
               CAST(max(kept_u) AS BIGINT) AS post_clip_l1_sensitivity,
               CAST(sum(dropped_u) AS BIGINT) AS dropped_events,
               CAST(sum(kept_u) AS BIGINT) AS kept_events
        FROM clipped GROUP BY clip ORDER BY clip
    """,
    tags=("governance", "privacy", "audit"),
)
def governance_dp_sensitivity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Differential-privacy budget planning table for releasing the
    (event_type, day) count histogram with USER-level privacy: for
    each per-user-per-cell contribution clip C in {_DP_CLIPS}, the
    exact post-clip L1 sensitivity (max over users of their total
    clipped contribution — the Δ that scales the Laplace/Gaussian
    noise) and the utility price (events dropped by clipping vs
    kept). Unclipped sensitivity is the C=16 row's ceiling read
    against the ladder; the release designer picks the knee. Joins
    the k-anonymity / l-diversity / t-closeness battery as the DP
    member of the governance family — everything exact integer
    arithmetic, so the oracle is exact.

    Scale shape: the cell rollup aggregates with map-side combine to
    at most |users| x |event_types| x |days| rows, the clip ladder is
    a {len(_DP_CLIPS)}x map-side explode of that bounded rollup, and
    both following aggregations are count/sum-only with map-side
    combine (per-user, then global max/sum — the final exchange is
    |clips| x |users| rows of integers).
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "user_id",
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    clipped = (
        cells.select(
            "user_id",
            "cnt",
            F.explode(
                F.array(*[F.lit(c).cast("long") for c in _DP_CLIPS])
            ).alias("clip"),
        )
        .groupBy("clip", "user_id")
        .agg(
            F.sum(F.least(F.col("cnt"), F.col("clip"))).alias("kept_u"),
            F.sum(
                F.col("cnt") - F.least(F.col("cnt"), F.col("clip"))
            ).alias("dropped_u"),
        )
    )
    return (
        clipped.groupBy(F.col("clip").cast("long").alias("clip"))
        .agg(
            F.max("kept_u").cast("long").alias("post_clip_l1_sensitivity"),
            F.sum("dropped_u").cast("long").alias("dropped_events"),
            F.sum("kept_u").cast("long").alias("kept_events"),
        )
        .orderBy("clip")
    )
