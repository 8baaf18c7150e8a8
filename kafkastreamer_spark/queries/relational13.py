"""Round-4 batch 89: link prediction, span-dedup reporting, and
vocabulary coverage — closure queries over machinery built in earlier
batches.

The reference has no relational/text surface (its operators are the
keyed arithmetic stages, Streamer.java:443-466); these serve the
§2-B capability closure and the LLM-pipeline reporting layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import SQL_TOKENS, tokens
from kafkastreamer_spark.operators.deskew import md5_ranked
from kafkastreamer_spark.operators.dedup_span import SPAN_K, _SQL_SH, dedup_span_excise
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table

_LP_CAP = 64  # same md5-rank degree ceiling as graph_bipartite_projection


@register(
    "graph_link_prediction_jaccard",
    oracle="""
        WITH ps0 AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        ps AS (
            SELECT p, s FROM (
                SELECT p, s,
                       row_number() OVER (
                           PARTITION BY p
                           ORDER BY md5(CAST(s AS VARCHAR)), s) AS rn
                FROM ps0
            ) WHERE rn <= 64
        ),
        deg AS (SELECT s, count(*) AS d FROM ps GROUP BY s),
        common AS (
            SELECT a.s AS supp_a, b.s AS supp_b, count(*) AS n_common
            FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
            GROUP BY 1, 2
        )
        SELECT supp_a, supp_b, n_common,
               CAST(da.d AS BIGINT) AS deg_a, CAST(db.d AS BIGINT) AS deg_b,
               CAST(floor(CAST(n_common AS DOUBLE) * 10000
                    / (da.d + db.d - n_common)) AS BIGINT) AS jaccard4
        FROM common
        JOIN deg da ON da.s = supp_a
        JOIN deg db ON db.s = supp_b
        ORDER BY jaccard4 DESC, supp_a, supp_b
        LIMIT 30
    """,
    tags=("graph", "link-prediction", "similarity"),
)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood Jaccard: for supplier pairs
    sharing at least one part, score = |parts(a) ∩ parts(b)| /
    |parts(a) ∪ parts(b)| — the classic common-neighbors predictor
    ("suppliers likely to co-occur next"), normalizing the raw shared
    count of graph_bipartite_projection by both degree profiles.

    Scale shape: identical to the capped projection — each part's
    supplier list is md5-rank-capped at 64 IN the plan before the
    pairing self-join (candidates bounded at C(64,2) per part), the
    degree table is a map-side-combining aggregate joined back onto
    the |pairs| frame, and top-30 compiles to TakeOrderedAndProject.
    The fixed-point Jaccard is pure integer + one correctly-rounded
    double division, identical in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        md5_ranked(
            li.select(
                F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
            ).distinct(),
            ["p"],
            key_col="s",
            rank_name="rn",
        )
        .filter(F.col("rn") <= _LP_CAP)
        .select("p", "s")
        .persist()
    )
    deg = ps.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    b = ps.select(F.col("p").alias("pb"), F.col("s").alias("supp_b"))
    common = (
        ps.withColumnRenamed("s", "supp_a")
        .join(b, (F.col("p") == F.col("pb")) & (F.col("supp_a") < F.col("supp_b")))
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    union_size = F.col("da.d") + F.col("db.d") - F.col("n_common")
    return (
        common.join(da, F.col("da.s") == F.col("supp_a"))
        .join(db, F.col("db.s") == F.col("supp_b"))
        .select(
            "supp_a",
            "supp_b",
            "n_common",
            F.col("da.d").cast("long").alias("deg_a"),
            F.col("db.d").cast("long").alias("deg_b"),
            F.floor(F.col("n_common").cast("double") * 10000 / union_size)
            .cast("long")
            .alias("jaccard4"),
        )
        .orderBy(F.desc("jaccard4"), "supp_a", "supp_b")
        .limit(30)
    )


@register(
    "dedup_span_source_report",
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
        per AS (
            SELECT w.doc_id, len(w.w) AS n_tokens,
                   coalesce(c.n_cov, 0) AS n_removed
            FROM words w LEFT JOIN (
                SELECT doc_id, count(*) AS n_cov FROM covered GROUP BY doc_id
            ) c ON c.doc_id = w.doc_id
        )
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(p.n_tokens) AS BIGINT) AS tot_tokens,
               CAST(sum(p.n_removed) AS BIGINT) AS removed_tokens,
               CAST(count(*) FILTER (WHERE p.n_removed > 0) AS BIGINT)
                   AS docs_touched,
               CAST(floor(CAST(sum(p.n_removed) AS DOUBLE) * 10000
                          / sum(p.n_tokens)) AS BIGINT) AS removed_pct4
        FROM per p JOIN documents d ON d.doc_id = p.doc_id
        GROUP BY d.source
        ORDER BY d.source
    """,
    tags=("llm-data", "dedup", "span", "reporting"),
)
def dedup_span_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source span-duplication report — the corpus-hygiene
    dashboard over dedup_span_excise: which ingestion sources carry
    the boilerplate. A real pretraining intake runs this BEFORE
    deciding to excise (a source with 40% duplicated tokens gets a
    pipeline fix, not a bandaid).

    Reuses the registered span-excision operator verbatim (same
    shuffles, see operators/dedup_span.py) and adds one broadcast-size
    join to the source dimension plus a |sources|-row aggregate."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    per = dedup_span_excise(spark, sf_dir).select(
        "doc_id", "n_tokens", "n_removed"
    )
    return (
        per.join(d, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tot_tokens"),
            F.sum("n_removed").cast("long").alias("removed_tokens"),
            F.count(F.when(F.col("n_removed") > 0, 1))
            .cast("long")
            .alias("docs_touched"),
            F.floor(
                F.sum("n_removed").cast("double") * 10000 / F.sum("n_tokens")
            )
            .cast("long")
            .alias("removed_pct4"),
        )
        .orderBy("source")
    )


@register(
    "text_vocab_coverage",
    oracle=f"""
        WITH words AS (SELECT {SQL_TOKENS} AS w FROM documents),
        tok AS (SELECT unnest(w) AS t FROM words),
        freq AS (SELECT t, count(*) AS occ FROM tok GROUP BY t),
        total AS (SELECT CAST(sum(occ) AS BIGINT) AS tot FROM freq),
        ranked AS (
            SELECT t, occ,
                   row_number() OVER (ORDER BY occ DESC, t) AS rk
            FROM freq
        ),
        top AS (SELECT * FROM ranked WHERE rk <= 100),
        buckets AS (
            SELECT CAST((rk - 1) // 10 + 1 AS BIGINT) AS bucket,
                   CAST(sum(occ) AS BIGINT) AS occ
            FROM top GROUP BY 1
        ),
        cum AS (
            SELECT bucket, occ,
                   CAST(sum(occ) OVER (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_occ
            FROM buckets
        )
        SELECT bucket, occ, cum_occ,
               CAST(floor(CAST(cum_occ AS DOUBLE) * 10000 / tot) AS BIGINT)
                   AS cov4
        FROM cum, total
        ORDER BY bucket
    """,
    tags=("llm-data", "text", "tokenizer"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: how much of the corpus token stream
    the top-100 vocabulary covers, in ranks-of-10 buckets — the audit
    a tokenizer build runs to size its vocab (the knee of this curve
    IS the vocab-size decision), companion to text_vocab_growth
    (types over volume) and tokenizer_bpe_first_merges.

    Scale shape: one map-side-combining token-frequency aggregate
    (|vocab| rows out of the token stream), top-100 by
    TakeOrderedAndProject, then bucketing/cumsum on ≤100 rows. The
    grand total rides the same frequency aggregate re-reduced — the
    corpus is scanned once."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("occ"))
        .persist()
    )
    total = freq.agg(F.sum("occ").cast("long").alias("tot"))
    # top-100 via sort+limit (TakeOrderedAndProject — each task keeps
    # 100 rows); the rank window then runs over ≤100 survivors, never
    # the full |vocab| in one partition
    top = (
        freq.orderBy(F.desc("occ"), "t")
        .limit(100)
        .withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("occ"), "t"))
        )
    )
    buckets = top.groupBy(
        (F.expr("(rk - 1) div 10") + 1).cast("long").alias("bucket")
    ).agg(F.sum("occ").cast("long").alias("occ"))
    wc = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        buckets.withColumn("cum_occ", F.sum("occ").over(wc).cast("long"))
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "occ",
            "cum_occ",
            F.floor(F.col("cum_occ").cast("double") * 10000 / F.col("tot"))
            .cast("long")
            .alias("cov4"),
        )
        .orderBy("bucket")
    )
