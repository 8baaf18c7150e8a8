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
    norm,
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


# ---------------------------------------------------------------------------
# batch 227: corpus QA battery (contamination matrix, embedding norms,
# Zipf octaves, n-gram novelty)
# ---------------------------------------------------------------------------


@register(
    "text_contamination_matrix",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, source, {SQL_TOKENS} AS w FROM documents
        ),
        sh AS (
            SELECT doc_id, source, {sql_shingles("w")} AS sh
            FROM tok WHERE len(w) >= 3
        ),
        sizes AS (
            SELECT doc_id, source, CAST(len(sh) AS BIGINT) AS n_sh FROM sh
        ),
        posting AS (
            SELECT doc_id, source, unnest(sh) AS s FROM sh
        ),
        evals AS (
            SELECT DISTINCT source AS eval_source, s FROM posting
        ),
        hits AS (
            SELECT p.doc_id, p.source, e.eval_source,
                   CAST(count(*) AS BIGINT) AS n_ov
            FROM posting p JOIN evals e
              ON p.s = e.s AND p.source <> e.eval_source
            GROUP BY 1, 2, 3
        ),
        flagged AS (
            SELECT h.source, h.eval_source,
                   CAST(count(*) AS BIGINT) AS n_contaminated
            FROM hits h JOIN sizes z ON z.doc_id = h.doc_id
            WHERE 5 * h.n_ov >= z.n_sh
            GROUP BY 1, 2
        ),
        base AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs
            FROM sizes GROUP BY source
        ),
        pairs AS (
            SELECT a.source AS train_source, b.source AS eval_source
            FROM base a CROSS JOIN base b WHERE a.source <> b.source
        )
        SELECT p.train_source, p.eval_source AS eval_source, b.n_docs,
               COALESCE(f.n_contaminated, 0) AS n_contaminated,
               (10000 * COALESCE(f.n_contaminated, 0)) // b.n_docs
                   AS contam_rate4
        FROM pairs p
        JOIN base b ON b.source = p.train_source
        LEFT JOIN flagged f
          ON f.source = p.train_source AND f.eval_source = p.eval_source
        ORDER BY p.train_source, p.eval_source
    """,
    tags=("llm-data", "dedup", "decontamination", "audit"),
)
def text_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise contamination matrix over sources: for every ordered
    (train_source, eval_source) pair, the fraction of train docs whose
    word-3-gram sets overlap the eval source's shingle set by >= 20%
    (``dedup_decontaminate``'s threshold, integer cross-multiplied) —
    the MULTI-benchmark generalization of that query: one run prices
    leakage against every benchmark at once, the table a curator reads
    before deciding which sources need excision.

    Scale shape: the per-source eval shingle sets come from the same
    posting explode as the train side (one distinct aggregate); the
    hit join's volume is sum_s df(s) x |sources containing s| <=
    |posting| x |sources| — linear in the corpus for a fixed source
    count, never |train| x |eval|. The final matrix is |sources|^2
    rows built from a broadcast cross of the tiny per-source count
    table.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    sh = d.select(
        "doc_id",
        "source",
        F.when(
            F.size(tokens("text")) >= 3, shingles(tokens("text"))
        ).alias("sh"),
    ).filter(F.col("sh").isNotNull())
    sizes = sh.select(
        "doc_id", "source", F.size("sh").cast("long").alias("n_sh")
    )
    posting = sh.select("doc_id", "source", F.explode("sh").alias("s"))
    evals = posting.select(
        F.col("source").alias("eval_source"), "s"
    ).distinct()
    hits = (
        posting.join(
            evals,
            (posting["s"] == evals["s"])
            & (posting["source"] != evals["eval_source"]),
        )
        .groupBy("doc_id", "source", "eval_source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ov"))
    )
    flagged = (
        hits.join(sizes.select("doc_id", "n_sh"), "doc_id")
        .filter(F.col("n_ov") * 5 >= F.col("n_sh"))
        .groupBy("source", "eval_source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated"))
    )
    base = sizes.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    pairs = (
        base.select(F.col("source").alias("train_source"), "n_docs")
        .crossJoin(
            F.broadcast(base.select(F.col("source").alias("eval_source")))
        )
        .filter(F.col("train_source") != F.col("eval_source"))
    )
    return (
        pairs.join(
            flagged,
            (flagged["source"] == pairs["train_source"])
            & (flagged["eval_source"] == pairs["eval_source"]),
            "left",
        )
        .select(
            "train_source",
            pairs["eval_source"],
            "n_docs",
            F.coalesce(F.col("n_contaminated"), F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contam_rate4", F.expr("(10000 * n_contaminated) div n_docs")
        )
        .orderBy("train_source", "eval_source")
    )


@register(
    "embedding_norm_audit",
    oracle="""
        WITH e AS (
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(floor(sqrt(list_dot_product(
                       CAST(embedding AS DOUBLE[]),
                       CAST(embedding AS DOUBLE[]))) * 10000) AS BIGINT)
                       AS norm4
            FROM embeddings
        ),
        gv AS (
            SELECT label, norm4, CAST(count(*) AS BIGINT) AS cnt
            FROM e GROUP BY 1, 2
        ),
        cum AS (
            SELECT label, norm4, cnt,
                   CAST(sum(cnt) OVER (PARTITION BY label ORDER BY norm4)
                        AS BIGINT) AS c,
                   CAST(sum(cnt) OVER (PARTITION BY label) AS BIGINT) AS n
            FROM gv
        )
        SELECT label,
               CAST(max(n) AS BIGINT) AS n_vecs,
               CAST(sum(norm4 * cnt) AS BIGINT) // max(n) AS mean_norm4,
               min(CASE WHEN c >= (50 * n + 99) // 100 THEN norm4 END)
                   AS p50_norm4,
               min(CASE WHEN c >= (95 * n + 99) // 100 THEN norm4 END)
                   AS p95_norm4,
               max(norm4) AS max_norm4
        FROM cum GROUP BY label ORDER BY label
    """,
    tags=("llm-data", "embedding", "audit", "quantiles"),
)
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding NORM distribution: count, mean, exact
    discrete p50/p95, and max of ||v|| in 1e-4 fixed point — the
    second embedding-health dashboard next to the isotropy audit
    (relational18.py): collapsed or exploding norms are the other
    silent failure of a representation pipeline (norm outliers also
    break inner-product retrieval calibration).

    Determinism: the norm is sqrt of the sequential left-fold dot
    product (both IEEE-exact and bit-identical to DuckDB's
    list_dot_product), floored to BIGINT fp4 PER ROW; everything
    after is integer arithmetic — the quantiles use the upper-discrete
    ceil(q*n) convention on the per-label distinct-value cumulative
    table (customer_order_gap_quartiles' machinery).

    Scale shape: one map pass quantizes; the (label, norm4) counts
    aggregate map-side-combines; windows run over the DISTINCT-VALUE
    domain per label (<= 10^5 rows per label at fp4 resolution for
    unit-ish vectors, regardless of corpus size) — never over raw
    vectors. No single-partition stages.
    """
    from pyspark.sql import Window

    e = widen(load_table(spark, sf_dir, "embeddings")).select(
        F.col("label").cast("long").alias("label"),
        F.floor(
            norm(F.transform("embedding", lambda x: x.cast("double")))
            * 10000
        )
        .cast("long")
        .alias("norm4"),
    )
    gv = e.groupBy("label", "norm4").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = (
        Window.partitionBy("label")
        .orderBy("norm4")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("label")
    cum = gv.select(
        "label",
        "norm4",
        "cnt",
        F.sum("cnt").over(wcum).cast("long").alias("c"),
        F.sum("cnt").over(wall).cast("long").alias("n"),
    )

    def q(p: int, name: str):
        return F.min(
            F.when(
                F.col("c") >= F.expr(f"({p} * n + 99) div 100"), F.col("norm4")
            )
        ).alias(name)

    return (
        cum.groupBy("label")
        .agg(
            F.max("n").cast("long").alias("n_vecs"),
            (
                F.sum(F.col("norm4") * F.col("cnt")).cast("long")
            ).alias("_s4"),
            q(50, "p50_norm4"),
            q(95, "p95_norm4"),
            F.max("norm4").alias("max_norm4"),
        )
        .withColumn("mean_norm4", F.expr("_s4 div n_vecs"))
        .select(
            "label", "n_vecs", "mean_norm4", "p50_norm4", "p95_norm4",
            "max_norm4",
        )
        .orderBy("label")
    )


_ZIPF_OCTAVES = (1, 2, 4, 8, 16, 32, 64)


@register(
    "text_zipf_octave_ratios",
    oracle=f"""
        WITH tok AS (
            SELECT source, unnest({SQL_TOKENS}) AS token FROM documents
        ),
        counts AS (
            SELECT source, token, CAST(count(*) AS BIGINT) AS freq
            FROM tok WHERE token <> '' GROUP BY 1, 2
        ),
        ranked AS (
            SELECT source, token, freq,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY freq DESC, token) AS rnk
            FROM counts
        ),
        oct AS (
            SELECT source, CAST(rnk AS BIGINT) AS rnk, token, freq
            FROM ranked WHERE rnk IN {_ZIPF_OCTAVES}
        )
        SELECT a.source, a.rnk, a.token, a.freq,
               CASE WHEN b.freq IS NOT NULL
                    THEN (10000 * a.freq) // b.freq END AS ratio2x4
        FROM oct a LEFT JOIN oct b
          ON b.source = a.source AND b.rnk = a.rnk * 2
        ORDER BY a.source, a.rnk
    """,
    tags=("llm-data", "text", "audit", "statistics"),
)
def text_zipf_octave_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law health check per source WITHOUT transcendentals: the
    token frequency at octave ranks (1, 2, 4, ..., 64) and the exact
    fixed-point ratio freq(r)/freq(2r). Under Zipf with exponent s
    that ratio is ~2^s at every octave, so the table IS the slope
    estimate — log2 of one exact rational per row is left to the
    consumer, per the repo-wide transcendental rule (ln/log are not
    bit-stable across engines; see relational14's WOE note). A flat or
    erratic octave profile flags template/boilerplate corpora the
    quality gates miss.

    Scale shape: token counts map-side-combine; the top-64 rank is
    computed WITHOUT a per-source vocabulary sort — within each
    (source, frequency) class rows are ranked by token with a
    first-character deskew bucket (operators/deskew.py), classes are
    offset by the tiny per-(source, freq) counts table (|distinct
    freq| rows per source, a cumulative window over that domain only),
    and global_rank = class_offset + within-class rank, bit-identical
    to the single-window formulation. Only ranks <= 64 survive to the
    octave self-join (|sources| x 7 rows).
    """
    from pyspark.sql import Window

    from kafkastreamer_spark.operators.deskew import bucketed_row_number

    d = widen(load_table(spark, sf_dir, "documents"))
    counts = (
        d.select("source", F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    in_class = bucketed_row_number(
        counts,
        ["source", "freq"],
        F.substring("token", 1, 1),
        [F.col("token").asc()],
        "_crnk",
    ).filter(F.col("_crnk") <= max(_ZIPF_OCTAVES))
    fdist = counts.groupBy("source", "freq").agg(
        F.count(F.lit(1)).cast("long").alias("_ntok")
    )
    woff = (
        Window.partitionBy("source")
        .orderBy(F.col("freq").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = fdist.select(
        "source",
        "freq",
        F.coalesce(F.sum("_ntok").over(woff), F.lit(0)).alias("_off"),
    )
    oct_rows = (
        in_class.join(offs, ["source", "freq"])
        .withColumn("rnk", (F.col("_off") + F.col("_crnk")).cast("long"))
        .filter(F.col("rnk").isin(*_ZIPF_OCTAVES))
        .select("source", "rnk", "token", "freq")
    )
    a = oct_rows.alias("a")
    b = oct_rows.alias("b")
    return (
        a.join(
            b,
            (F.col("b.source") == F.col("a.source"))
            & (F.col("b.rnk") == F.col("a.rnk") * 2),
            "left",
        )
        .select(
            F.col("a.source").alias("source"),
            F.col("a.rnk").alias("rnk"),
            F.col("a.token").alias("token"),
            F.col("a.freq").alias("freq"),
            F.when(
                F.col("b.freq").isNotNull(),
                F.expr("(10000 * a.freq) div b.freq"),
            ).alias("ratio2x4"),
        )
        .orderBy("source", "rnk")
    )


@register(
    "text_ngram_novelty_decile",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, {SQL_TOKENS} AS w FROM documents
        ),
        sh AS (
            SELECT doc_id, {sql_shingles("w")} AS sh
            FROM tok WHERE len(w) >= 3
        ),
        posting AS (
            SELECT doc_id, unnest(sh) AS s FROM sh
        ),
        docs AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY doc_id) AS r,
                   COUNT(*) OVER () AS n
            FROM sh
        ),
        dec AS (
            SELECT doc_id,
                   CAST((r - 1) * 10 // n + 1 AS BIGINT) AS decile
            FROM docs
        ),
        firsts AS (
            SELECT s, CAST(min(doc_id) AS BIGINT) AS first_doc
            FROM posting GROUP BY s
        )
        SELECT d.decile,
               CAST(count(*) AS BIGINT) AS n_postings,
               CAST(count(*) FILTER (WHERE p.doc_id = f.first_doc) AS BIGINT)
                   AS n_novel,
               (10000 * count(*) FILTER (WHERE p.doc_id = f.first_doc))
                   // count(*) AS novelty4
        FROM posting p
        JOIN firsts f ON f.s = p.s
        JOIN dec d ON d.doc_id = p.doc_id
        GROUP BY d.decile ORDER BY d.decile
    """,
    tags=("llm-data", "text", "dedup", "audit"),
)
def text_ngram_novelty_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus NOVELTY curve: walk the corpus in doc_id order, split it
    into ten equal deciles, and report per decile what fraction of
    3-gram postings are globally NOVEL (their first occurrence in the
    whole corpus is in that document). A healthy growing corpus keeps
    a high novelty tail; a curve collapsing toward zero says later
    intake is re-crawling what the corpus already holds — the
    diminishing-returns diagnostic that motivates dedup-before-train
    (Lee et al. 2022), complementary to the cross-source matrix
    (which localizes WHO overlaps, not WHEN saturation set in).

    Determinism: novelty is doc_id == min(doc_id) per shingle —
    integer; deciles come from the explicit (rank-1)*10 div n + 1
    formula, not NTILE (whose remainder placement is
    engine-convention).

    Scale shape: first-occurrence is a min-aggregate per shingle
    (map-side combine); the posting-to-firsts join shuffles on the
    shingle (the memorization report's cost class: linear in posting
    volume, counts only); the doc rank is computed with a RANGE
    deskew bucket (doc_id div 1024) via operators/deskew.py — no
    global single-task sort at any size — and joins back to postings
    on doc_id.
    """
    from kafkastreamer_spark.operators.deskew import bucketed_row_number

    d = widen(load_table(spark, sf_dir, "documents"))
    sh = d.select(
        "doc_id",
        F.when(
            F.size(tokens("text")) >= 3, shingles(tokens("text"))
        ).alias("sh"),
    ).filter(F.col("sh").isNotNull())
    posting = sh.select("doc_id", F.explode("sh").alias("s"))
    docs = bucketed_row_number(
        sh.select("doc_id"),
        [],
        (F.col("doc_id") / 1024).cast("long"),
        [F.col("doc_id").asc()],
        "_r",
        count_name="_n",
    ).select(
        "doc_id",
        F.expr("CAST((_r - 1) * 10 div _n + 1 AS BIGINT)").alias("decile"),
    )
    firsts = posting.groupBy("s").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    return (
        posting.join(firsts, "s")
        .join(docs, "doc_id")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_postings"),
            F.count_if(F.col("doc_id") == F.col("first_doc"))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn("novelty4", F.expr("(10000 * n_novel) div n_postings"))
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# batch 228: training-intake economics (packing waste, dedup-rate curve)
# ---------------------------------------------------------------------------

_PACK_LEN = 512  # training sequence length for the waste audit


@register(
    "sample_pack_waste_audit",
    oracle=f"""
        WITH tok AS (
            SELECT source, CAST(len({SQL_TOKENS}) AS BIGINT) AS nt
            FROM documents
        ),
        pad AS (
            SELECT source, nt,
                   ((nt + {_PACK_LEN} - 1) // {_PACK_LEN}) * {_PACK_LEN}
                       AS padded
            FROM tok
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS total_tokens,
               CAST(sum(padded) AS BIGINT) AS padded_tokens,
               (10000 * (sum(padded) - sum(nt))) // sum(padded)
                   AS waste4
        FROM pad GROUP BY source ORDER BY source
    """,
    tags=("llm-data", "sampling", "training-data", "audit"),
)
def sample_pack_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for doc-isolated training batches: per
    source, the tokens a {_PACK_LEN}-token sequence layout pads away
    when each document is chunked to whole sequences (padded =
    ceil(n/{_PACK_LEN})·{_PACK_LEN}), with the waste share in basis
    points. This prices what the packing operator
    (text_pack_sequences) SAVES — the before/after pair every intake
    pipeline quotes when deciding between doc-isolated and packed
    batches; sources full of short documents show the worst waste and
    are the first candidates for packing or concat-with-separator.

    Exact integer arithmetic end to end (ceil-div and basis points via
    integer ops). Scale: one map pass + a per-source combine —
    scan-bound, no joins, no windows.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    pad = d.select(
        "source",
        F.size(tokens("text")).cast("long").alias("nt"),
    ).select(
        "source",
        "nt",
        F.expr(
            f"((nt + {_PACK_LEN - 1}) div {_PACK_LEN}) * {_PACK_LEN}"
        ).alias("padded"),
    )
    return (
        pad.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("total_tokens"),
            F.sum("padded").cast("long").alias("padded_tokens"),
        )
        .withColumn(
            "waste4",
            F.expr(
                "(10000 * (padded_tokens - total_tokens)) div padded_tokens"
            ),
        )
        .orderBy("source")
    )


@register(
    "dedup_rate_by_decile",
    oracle="""
        WITH h AS (
            SELECT doc_id, md5(text) AS hsh FROM documents
        ),
        firsts AS (
            SELECT hsh, CAST(min(doc_id) AS BIGINT) AS first_doc
            FROM h GROUP BY hsh
        ),
        docs AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY doc_id) AS r,
                   COUNT(*) OVER () AS n
            FROM h
        ),
        dec AS (
            SELECT doc_id,
                   CAST((r - 1) * 10 // n + 1 AS BIGINT) AS decile
            FROM docs
        )
        SELECT d.decile,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE x.doc_id <> f.first_doc)
                    AS BIGINT) AS n_dup,
               (10000 * count(*) FILTER (WHERE x.doc_id <> f.first_doc))
                   // count(*) AS dup_rate4
        FROM h x
        JOIN firsts f ON f.hsh = x.hsh
        JOIN dec d ON d.doc_id = x.doc_id
        GROUP BY d.decile ORDER BY d.decile
    """,
    tags=("llm-data", "dedup", "audit"),
)
def dedup_rate_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate over corpus intake order: walk the corpus
    in doc_id order, split into ten deciles, and report per decile the
    share of documents that are byte-identical (md5) to an EARLIER
    document anywhere in the corpus. The doc-level companion of
    text_ngram_novelty_decile: a rising curve says the crawl is
    re-fetching what it already has — the trigger for moving exact
    dedup from batch cleanup into the intake path
    (dedup_incremental / the corpus topology's exact_dedup stage).

    Determinism: duplicate means doc_id != min(doc_id) of its content
    hash — pure integers; deciles use the explicit rank formula (not
    NTILE). Scale: min-per-hash aggregates map-side; the doc rank uses
    the RANGE deskew bucket (no global single-task sort); one join
    back on doc_id.
    """
    from kafkastreamer_spark.operators.deskew import bucketed_row_number

    d = widen(load_table(spark, sf_dir, "documents"))
    h = d.select("doc_id", F.md5("text").alias("hsh"))
    firsts = h.groupBy("hsh").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    docs = bucketed_row_number(
        h.select("doc_id"),
        [],
        (F.col("doc_id") / 1024).cast("long"),
        [F.col("doc_id").asc()],
        "_r",
        count_name="_n",
    ).select(
        "doc_id",
        F.expr("CAST((_r - 1) * 10 div _n + 1 AS BIGINT)").alias("decile"),
    )
    return (
        h.join(firsts, "hsh")
        .join(docs, "doc_id")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_if(F.col("doc_id") != F.col("first_doc"))
            .cast("long")
            .alias("n_dup"),
        )
        .withColumn("dup_rate4", F.expr("(10000 * n_dup) div n_docs"))
        .orderBy("decile")
    )
