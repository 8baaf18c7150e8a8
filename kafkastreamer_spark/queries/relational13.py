"""Round-4 batches 89–118: link prediction, span-dedup reporting,
vocabulary coverage, multi-agg pivot, rank statistics (Mann–Whitney,
Spearman, Cohen's d, runs test), time-series operators (EWMA, CUSUM,
seasonal decomposition, change-point, autocorrelation, interpolation,
peak concurrency), ML featurization (target encoding, k-fold/group
k-fold, hashing trick, JL projection, power iteration), the DAG
compiler under the oracle gate, shared-dialect SQL #3, collations,
DECIMAL(38) accumulation, OTIF, and the cross-source dup matrix.

The reference has no relational/text surface (its operators are the
keyed arithmetic stages, Streamer.java:443-466); these serve the
§2-B capability closure, the LLM-pipeline layer, and the Part-C
extensions inventory (SURVEY.md §2-C). Determinism discipline
throughout: exact integer/fixed-point sums, correctly-rounded double
finishing ops shared verbatim with the oracles, de-skewed global
orders via the two-phase bucket cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import SQL_TOKENS, tokens
from kafkastreamer_spark.operators.deskew import bucketed_row_number, md5_ranked
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


@register(
    "relational_pivot_multi_agg",
    oracle="""
        SELECT strftime(o_orderdate, '%Y') AS year,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                   AS urgent_n,
               CAST(coalesce(sum(CAST(floor(o_totalprice * 10000) AS BIGINT))
                    FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS BIGINT)
                   AS urgent_rev4,
               count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low_n,
               CAST(coalesce(sum(CAST(floor(o_totalprice * 10000) AS BIGINT))
                    FILTER (WHERE o_orderpriority = '5-LOW'), 0) AS BIGINT)
                   AS low_rev4
        FROM orders GROUP BY 1 ORDER BY year
    """,
    tags=("relational", "pivot", "reshape"),
)
def relational_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per cell — events_type_pivot
    rotates one measure; real reporting pivots rotate several (count
    AND revenue per priority column). Spark's ``pivot()`` with a
    values list and two aggs compiles to one pass of conditional
    aggregates — exactly the FILTER-clause form the oracle spells out,
    so there is no second scan per measure.

    Scale: a single map-side-combining aggregate to |years| rows; the
    pivot list is explicit (no distinct-values pre-query)."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.withColumn("year", F.date_format("o_orderdate", "yyyy"))
        .groupBy("year")
        .pivot("o_orderpriority", ["1-URGENT", "5-LOW"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.floor(F.col("o_totalprice") * 10000).cast("long")),
                F.lit(0),
            )
            .cast("long")
            .alias("rev4"),
        )
    )
    return piv.select(
        "year",
        F.col("1-URGENT_n").alias("urgent_n"),
        F.col("1-URGENT_rev4").alias("urgent_rev4"),
        F.col("5-LOW_n").alias("low_n"),
        F.col("5-LOW_rev4").alias("low_rev4"),
    ).orderBy("year")


@register(
    "orders_updown_runs_test",
    oracle="""
        WITH daily AS (
            SELECT o_orderdate AS d,
                   CAST(sum(CAST(floor(o_totalprice * 10000) AS BIGINT))
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1
        ),
        steps AS (
            SELECT d, rev,
                   lag(rev) OVER (ORDER BY d) AS prev
            FROM daily
        ),
        signs AS (
            SELECT CASE WHEN rev > prev THEN 1 ELSE 0 END AS up,
                   CASE WHEN (rev > prev) <> (lag(rev > prev) OVER (ORDER BY d))
                        THEN 1 ELSE 0 END AS flip
            FROM steps WHERE prev IS NOT NULL AND rev <> prev
        )
        SELECT CAST(sum(up) AS BIGINT) AS n_up,
               CAST(count(*) - sum(up) AS BIGINT) AS n_down,
               CAST(1 + coalesce(sum(flip), 0) AS BIGINT) AS n_runs
        FROM signs
    """,
    tags=("aggregate", "statistics", "time-series"),
)
def orders_updown_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz up/down runs count over the daily-revenue
    series: how many maximal runs of consecutive increases/decreases
    the sequence holds (few runs = trending, many = oscillating) —
    the non-parametric randomness check a forecasting pipeline applies
    before trusting a trend model. Equal-revenue days are dropped
    (standard treatment); revenue compares in exact fixed-point so
    the up/down signs are engine-identical.

    Scale note: the sign/flip windows order by day over the DAILY
    aggregate (|days| rows, map-side reduced from orders) — a global
    window over a bounded calendar series, the same accepted shape as
    events_daily_delta; never over raw orders."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 10000).cast("long"))
        .cast("long")
        .alias("rev")
    )
    w = Window.orderBy("d")
    steps = daily.withColumn("prev", F.lag("rev").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("rev") != F.col("prev"))
    )
    signs = steps.select(
        "d",
        F.when(F.col("rev") > F.col("prev"), 1).otherwise(0).alias("up"),
    ).withColumn(
        "flip",
        F.when(
            F.col("up") != F.lag("up").over(Window.orderBy("d")), 1
        ).otherwise(0),
    )
    return signs.agg(
        F.sum("up").cast("long").alias("n_up"),
        (F.count(F.lit(1)) - F.sum("up")).cast("long").alias("n_down"),
        (F.lit(1) + F.coalesce(F.sum("flip"), F.lit(0)))
        .cast("long")
        .alias("n_runs"),
    )


@register(
    "orders_mann_whitney_u",
    oracle="""
        WITH ab AS (
            SELECT o_totalprice AS v,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                       AS is_a
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        per_v AS (
            SELECT v, CAST(sum(is_a) AS BIGINT) AS a,
                   CAST(count(*) AS BIGINT) AS m
            FROM ab GROUP BY v
        ),
        cum AS (
            SELECT v, a, m,
                   CAST(coalesce(sum(m) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS c
            FROM per_v
        ),
        sums AS (
            SELECT CAST(sum(a) AS BIGINT) AS n_a,
                   CAST(sum(m - a) AS BIGINT) AS n_b,
                   CAST(sum(a * (2*c + m + 1)) AS BIGINT) AS two_r_a,
                   CAST(sum(m*m*m - m) AS BIGINT) AS tie_term
            FROM cum
        )
        SELECT n_a, n_b,
               two_r_a - n_a * (n_a + 1) AS two_u_a,
               CAST(floor(10000 * ((CAST(two_r_a - n_a*(n_a+1) AS DOUBLE) / 2
                                    - CAST(n_a AS DOUBLE) * n_b / 2)
                    / sqrt((CAST(n_a AS DOUBLE) * n_b / 12)
                           * ((n_a + n_b + 1)
                              - CAST(tie_term AS DOUBLE)
                                / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1))))))
                    AS BIGINT) AS z4
        FROM sums
    """,
    tags=("aggregate", "statistics", "deskew"),
)
def orders_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U test: do URGENT and LOW priority orders draw
    from the same price distribution? The exact tie-corrected rank-sum
    statistic, computed distributively:

    * doubled average ranks keep everything integer — for a distinct
      value with c smaller observations and multiplicity m, every
      tied observation's doubled rank is 2c + m + 1, so
      2·R_A = Σ a·(2c+m+1) is an exact BIGINT;
    * the exclusive cumulative count c comes from the two-phase
      range-bucket cumsum (the sample_pps_systematic shape): buckets
      of floor(price/4096) get partitioned within-bucket windows and
      the |buckets|-row totals table provides offsets — no
      single-partition window over the distinct-value table;
    * the z-score (tie-corrected variance) is formed from the exact
      integer sums in doubles — +,*,/,sqrt are all correctly-rounded
      IEEE ops both engines execute identically.

    Scale shape: one groupBy on price value (map-side combine), the
    tiny bucket-offsets window, one final 4-number reduce."""
    o = load_table(spark, sf_dir, "orders")
    ab = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("is_a"),
    )
    per_v = ab.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("a"),
        F.count(F.lit(1)).cast("long").alias("m"),
    ).withColumn("b", F.floor(F.col("v") / 4096).cast("long"))
    win_in = (
        Window.partitionBy("b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_v = per_v.withColumn(
        "c_in", F.coalesce(F.sum("m").over(win_in), F.lit(0))
    )
    totals = per_v.groupBy("b").agg(F.sum("m").alias("bt"))
    win_b = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "b", F.coalesce(F.sum("bt").over(win_b), F.lit(0)).alias("off")
    )
    cum = per_v.join(offs, "b").withColumn("c", F.col("off") + F.col("c_in"))
    sums = cum.agg(
        F.sum("a").cast("long").alias("n_a"),
        F.sum(F.col("m") - F.col("a")).cast("long").alias("n_b"),
        F.sum(F.col("a") * (2 * F.col("c") + F.col("m") + 1))
        .cast("long")
        .alias("two_r_a"),
        F.sum(F.col("m") * F.col("m") * F.col("m") - F.col("m"))
        .cast("long")
        .alias("tie_term"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    two_u_a = F.col("two_r_a") - F.col("n_a") * (F.col("n_a") + 1)
    n = F.col("n_a") + F.col("n_b")
    var = (na * nb / 12) * (
        (n + 1).cast("double")
        - F.col("tie_term").cast("double") / (n.cast("double") * (n - 1).cast("double"))
    )
    return sums.select(
        "n_a",
        "n_b",
        two_u_a.alias("two_u_a"),
        F.floor(
            10000
            * ((two_u_a.cast("double") / 2 - na * nb / 2) / F.sqrt(var))
        )
        .cast("long")
        .alias("z4"),
    )


@register(
    "pipeline_dag_diamond",
    oracle="""
        WITH src AS (
            SELECT CONCAT('Key', CAST(user_id % 2 AS VARCHAR)) AS key,
                   event_id AS v
            FROM events
        ),
        clean AS (SELECT key, v + 1 AS v FROM src),
        lft AS (SELECT key, v + 1 AS v FROM clean),
        rgt AS (SELECT key, v - 1 AS v FROM clean),
        merged AS (
            SELECT key, v, 'left' AS branch FROM lft
            UNION ALL
            SELECT key, v, 'right' AS branch FROM rgt
        )
        SELECT key, CAST(v AS BIGINT) AS value, branch
        FROM merged ORDER BY value, branch, key
    """,
    tags=("reference", "pipeline", "dag"),
)
def pipeline_dag_diamond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DAG compiler (plans/dag.py) under the driver's oracle gate:
    a diamond topology — source → clean(+1) forking into a +1 branch
    and a −1 branch, union-merged — evaluated through validate_dag +
    compile_dag, against the oracle's CTE spelling of the same DAG.
    Generalizes ref_stage_chain_adder (A14's linear chain) to the
    fan-out/fan-in composition the reference cannot express; every
    input record i emerges exactly twice, as i+2 and as i.

    Plan shape: the whole DAG folds into two projections over one
    scan unioned — no shuffle at all until the output sort."""
    from kafkastreamer_spark.plans.dag import compile_dag, from_dict

    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        F.concat(F.lit("Key"), (F.col("user_id") % 2).cast("string")).alias("key"),
        F.col("event_id").cast("long").alias("value"),
    )
    spec = from_dict(
        {
            "stream_id": "diamond",
            "sinks": ["left", "right"],
            "nodes": [
                {"name": "src", "operation": "source"},
                {"name": "clean", "operation": "adder", "inputs": ["src"]},
                {"name": "left", "operation": "adder", "inputs": ["clean"]},
                {"name": "right", "operation": "diff", "inputs": ["clean"]},
            ],
        }
    )
    out = compile_dag(spec)({"src": src})
    merged = out["left"].withColumn("branch", F.lit("left")).unionByName(
        out["right"].withColumn("branch", F.lit("right"))
    )
    return merged.select("key", "value", "branch").orderBy(
        "value", "branch", "key"
    )


def _avg_doubled_ranks(df: DataFrame, valcol: str, bucket_w: float) -> DataFrame:
    """(value, dr) — doubled average rank 2c+m+1 per distinct value of
    ``valcol`` (c = exclusive cumulative count, m = multiplicity),
    via the two-phase range-bucket cumsum so no single-partition
    window ever sees the distinct-value table (same shape as
    orders_mann_whitney_u / sample_pps_systematic)."""
    per_v = df.groupBy(F.col(valcol).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("m")
    ).withColumn("b", F.floor(F.col("v") / bucket_w).cast("long"))
    win_in = (
        Window.partitionBy("b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_v = per_v.withColumn(
        "c_in", F.coalesce(F.sum("m").over(win_in), F.lit(0))
    )
    totals = per_v.groupBy("b").agg(F.sum("m").alias("bt"))
    win_b = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "b", F.coalesce(F.sum("bt").over(win_b), F.lit(0)).alias("off")
    )
    return (
        per_v.join(offs, "b")
        .select(
            "v",
            (2 * (F.col("off") + F.col("c_in")) + F.col("m") + 1).alias("dr"),
        )
    )


@register(
    "lineitem_spearman_rho",
    oracle="""
        WITH rows_ AS (
            SELECT l_quantity AS q, l_extendedprice AS p FROM lineitem
        ),
        rq AS (
            SELECT v, 2 * (CAST(coalesce(sum(m) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT)) + m + 1 AS dr
            FROM (SELECT q AS v, CAST(count(*) AS BIGINT) AS m
                  FROM rows_ GROUP BY q)
        ),
        rp AS (
            SELECT v, 2 * (CAST(coalesce(sum(m) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT)) + m + 1 AS dr
            FROM (SELECT p AS v, CAST(count(*) AS BIGINT) AS m
                  FROM rows_ GROUP BY p)
        ),
        ranked AS (
            SELECT rq.dr AS x, rp.dr AS y
            FROM rows_ r JOIN rq ON rq.v = r.q JOIN rp ON rp.v = r.p
        ),
        sums AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM ranked
        )
        SELECT n,
               CAST(floor(10000 *
                    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                    / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                           * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
                    AS BIGINT) AS rho4
        FROM sums
    """,
    tags=("aggregate", "statistics", "deskew"),
)
def lineitem_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price —
    the tie-robust monotonic-association statistic, exact across
    engines because it is Pearson over integer average ranks: doubled
    average ranks (2c+m+1 per distinct value, rho is invariant under
    the 2× affine transform) keep every moment sum an exact BIGINT
    (Σdr² ≤ 4n³ — safe through ~2M rows; beyond that the sums move to
    DECIMAL(38), same plan), and the final rho is formed from those
    sums with correctly-rounded double ops shared verbatim with the
    oracle.

    Scale shape: each variable's rank table comes from a
    map-side-combining per-value aggregate with the two-phase bucket
    cumsum (no single-partition window over distinct values — the
    quantity table has ~50 rows, the price table ~|rows|); rows join
    their two rank tables by value (AQE broadcasts the tiny one), and
    everything reduces to one 6-number row."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("q"), F.col("l_extendedprice").alias("p")
    )
    rq = _avg_doubled_ranks(li, "q", 8.0).withColumnRenamed("dr", "x")
    rp = _avg_doubled_ranks(li, "p", 4096.0).withColumnRenamed("dr", "y")
    ranked = (
        li.join(rq, li.q == rq.v)
        .drop("v")
        .join(rp, li.p == rp.v)
        .select("x", "y")
    )
    sums = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = nd * F.col("sxy") - sxd * F.col("sy")
    vx = nd * F.col("sxx") - sxd * F.col("sx")
    vy = nd * F.col("syy") - syd * F.col("sy")
    return sums.select(
        "n",
        F.floor(10000 * num / F.sqrt(vx * vy)).cast("long").alias("rho4"),
    )


@register(
    "events_cusum_detect",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        target AS (
            SELECT event_type,
                   CAST(sum(c) // count(*) AS BIGINT) AS k
            FROM daily GROUP BY 1
        ),
        dev AS (
            SELECT d.event_type, d.day, d.c, d.c - t.k AS dv
            FROM daily d JOIN target t USING (event_type)
        ),
        cums AS (
            SELECT event_type, day, c,
                   CAST(sum(dv) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
            FROM dev
        ),
        acc AS (
            SELECT event_type, day, c, cum,
                   CAST(least(CAST(0 AS BIGINT),
                        min(cum) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                        AS BIGINT) AS floor_min
            FROM cums
        )
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day, c,
               cum - floor_min AS cusum,
               CASE WHEN cum - floor_min > 2 * c THEN 1 ELSE 0 END AS alarm
        FROM acc ORDER BY event_type, day
    """,
    tags=("events", "time-series", "anomaly"),
)
def events_cusum_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection over daily event counts — the
    change-point primitive behind "did this metric's level shift?"
    alerting, complementing the point-anomaly z-score/MAD family. The
    textbook recursion S_n = max(0, S_{n-1} + (c_n − k)) is not a
    window function, but its closed form IS:
    S_n = cum_n − min(0, min_{i≤n} cum_i) — a running sum and a
    running min over the same frame, both exact BIGINTs (k is the
    integer mean daily count per type).

    Scale shape: events collapse to |types|×|days| daily rows
    map-side; the windows order the small per-type calendar series —
    the same accepted bounded-series shape as events_ewma_halflife."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    target = daily.groupBy("event_type").agg(
        F.expr("sum(c) div count(*)").cast("long").alias("k")
    )
    dev = daily.join(target, "event_type").withColumn(
        "dv", F.col("c") - F.col("k")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    acc = dev.withColumn("cum", F.sum("dv").over(w).cast("long")).withColumn(
        "floor_min",
        F.least(F.lit(0).cast("long"), F.min("cum").over(w)).cast("long"),
    )
    s = F.col("cum") - F.col("floor_min")
    return acc.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "c",
        s.alias("cusum"),
        F.when(s > 2 * F.col("c"), 1).otherwise(0).alias("alarm"),
    ).orderBy("event_type", "day")


@register(
    "events_resample_interpolate",
    oracle="""
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
                       AS v4
            FROM events GROUP BY 1, 2
        ),
        hops AS (
            SELECT user_id, day, v4,
                   lead(day) OVER w AS nday,
                   lead(v4) OVER w AS nv4
            FROM daily
            WINDOW w AS (PARTITION BY user_id ORDER BY day)
        ),
        obs AS (
            SELECT user_id, strftime(day, '%Y-%m-%d') AS day, v4,
                   'obs' AS kind
            FROM daily
        ),
        interp AS (
            SELECT user_id,
                   strftime(day + CAST(g AS INTEGER), '%Y-%m-%d') AS day,
                   CAST(floor(CAST(v4 AS DOUBLE)
                        + CAST(nv4 - v4 AS DOUBLE) * g
                          / date_diff('day', day, nday)) AS BIGINT) AS v4,
                   'interp' AS kind
            FROM hops, unnest(range(1, date_diff('day', day, nday))) AS t(g)
            WHERE nday IS NOT NULL AND date_diff('day', day, nday) > 1
        )
        SELECT * FROM obs
        UNION ALL
        SELECT * FROM interp
        ORDER BY user_id, day
    """,
    tags=("events", "time-series", "resample"),
)
def events_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling by LINEAR interpolation — the companion to
    events_resample_ffill (carry-forward): interior missing days in
    each user's daily value series are filled on the straight line
    between the surrounding observations. Fixed-point endpoints make
    the interpolant deterministic: v₀ + (v₁−v₀)·g/gap evaluated in
    doubles over exact BIGINTs (two correctly-rounded IEEE ops), then
    floored — identical in both engines, no float accumulation.

    Scale shape: events collapse to per-(user, day) fixed-point sums
    map-side; one LEAD window per user over its observation days
    (bounded by the calendar); gap explosion emits only the missing
    days. Leading/trailing edges get no rows — interpolation needs
    both endpoints, unlike ffill's carry."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 10000).cast("long"))
        .cast("long")
        .alias("v4")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    hops = daily.withColumn("nday", F.lead("day").over(w)).withColumn(
        "nv4", F.lead("v4").over(w)
    )
    obs = daily.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "v4",
        F.lit("obs").alias("kind"),
    )
    gap = F.datediff("nday", "day")
    interp = (
        hops.filter(F.col("nday").isNotNull() & (gap > 1))
        .select(
            "user_id",
            "day",
            "v4",
            "nv4",
            gap.alias("gap"),
            F.explode(F.sequence(F.lit(1), gap - 1)).alias("g"),
        )
        .select(
            "user_id",
            F.date_format(
                F.date_add(F.col("day"), F.col("g").cast("int")), "yyyy-MM-dd"
            ).alias("day"),
            F.floor(
                F.col("v4").cast("double")
                + (F.col("nv4") - F.col("v4")).cast("double")
                * F.col("g")
                / F.col("gap")
            )
            .cast("long")
            .alias("v4"),
            F.lit("interp").alias("kind"),
        )
    )
    return obs.unionByName(interp).orderBy("user_id", "day")


_RAKE_STOPS = "('the', 'a', 'and', 'of', 'to')"


@register(
    "text_rake_keywords",
    oracle=f"""
        WITH words AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
        toks AS (
            SELECT doc_id, i AS pos, w[i] AS t,
                   CASE WHEN w[i] IN {_RAKE_STOPS} THEN 1 ELSE 0 END AS stop
            FROM words, unnest(range(1, len(w) + 1)) AS u(i)
        ),
        nonstop AS (
            SELECT doc_id, pos, t,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                       AS anchor
            FROM toks WHERE stop = 0
        ),
        phrase_occ AS (
            SELECT doc_id, anchor,
                   string_agg(t, ' ' ORDER BY pos) AS phrase,
                   CAST(count(*) AS BIGINT) AS plen
            FROM nonstop GROUP BY doc_id, anchor
        ),
        word_stats AS (
            SELECT n.t,
                   CAST(count(*) AS BIGINT) AS freq,
                   CAST(sum(p.plen) AS BIGINT) AS deg
            FROM nonstop n JOIN phrase_occ p
              ON p.doc_id = n.doc_id AND p.anchor = n.anchor
            GROUP BY n.t
        ),
        occ_scores AS (
            SELECT p.doc_id, p.anchor, p.phrase, p.plen,
                   CAST(sum(CAST(floor(10000.0 * s.deg / s.freq) AS BIGINT))
                        AS BIGINT) AS score4
            FROM nonstop n
            JOIN phrase_occ p ON p.doc_id = n.doc_id AND p.anchor = n.anchor
            JOIN word_stats s ON s.t = n.t
            GROUP BY p.doc_id, p.anchor, p.phrase, p.plen
        )
        SELECT phrase, CAST(max(plen) AS BIGINT) AS plen,
               CAST(count(*) AS BIGINT) AS n_occ,
               CAST(min(score4) AS BIGINT) AS score4
        FROM occ_scores
        WHERE plen >= 2
        GROUP BY phrase
        ORDER BY score4 DESC, phrase
        LIMIT 20
    """,
    tags=("llm-data", "text", "keywords"),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al.): candidate phrases are
    maximal stopword-free token runs — delimited by the language's
    function words — scored by Σ degree(w)/frequency(w) over their
    words, favoring longer collocations over bare frequent terms.
    Top-20 multi-word phrases corpus-wide.

    Determinism discipline: the per-word score is floored to
    fixed-point BEFORE the per-phrase sum (a sum of BIGINTs is
    order-independent; summing the rational scores as doubles would
    be partial-aggregation-order-dependent). Phrase runs group by the
    ``pos − row_number()`` anchor — the gaps-and-islands trick applied
    to token positions.

    Scale shape: tokenization is map-only; the phrase grouping and
    word-stats aggregates shuffle (doc, anchor) and word keys with
    map-side combine; per-doc windows are bounded by document length.
    Top-20 is TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "t")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "t")
    stops = ("the", "a", "and", "of", "to")
    nonstop = (
        toks.filter(~F.col("t").isin(*stops))
        .withColumn(
            "anchor",
            F.col("pos")
            - F.row_number().over(
                Window.partitionBy("doc_id").orderBy("pos")
            ),
        )
    )
    phrase_occ = nonstop.groupBy("doc_id", "anchor").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "t"))),
                lambda s: s["t"],
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).cast("long").alias("plen"),
    )
    word_stats = (
        nonstop.join(phrase_occ, ["doc_id", "anchor"])
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
        .withColumn(
            "wscore4",
            F.floor(10000.0 * F.col("deg") / F.col("freq")).cast("long"),
        )
    )
    occ_scores = (
        nonstop.join(phrase_occ, ["doc_id", "anchor"])
        .join(word_stats.select("t", "wscore4"), "t")
        .groupBy("doc_id", "anchor", "phrase", "plen")
        .agg(F.sum("wscore4").cast("long").alias("score4"))
    )
    return (
        occ_scores.filter(F.col("plen") >= 2)
        .groupBy("phrase")
        .agg(
            F.max("plen").cast("long").alias("plen"),
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.min("score4").cast("long").alias("score4"),
        )
        .orderBy(F.desc("score4"), "phrase")
        .limit(20)
    )


@register(
    "events_seasonal_decompose",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        ma AS (
            SELECT day, c,
                   CASE WHEN count(*) OVER w = 7
                        THEN (sum(c) OVER w * 10000) // 7 END AS trend4,
                   CAST(dayofweek(day) AS BIGINT) AS dow
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        det AS (
            SELECT day, c, dow, trend4, c * 10000 - trend4 AS det4
            FROM ma
        ),
        seas AS (
            SELECT dow,
                   CAST(floor(CAST(sum(det4) AS DOUBLE) / count(det4))
                        AS BIGINT) AS seasonal4
            FROM det WHERE det4 IS NOT NULL GROUP BY dow
        )
        SELECT strftime(d.day, '%Y-%m-%d') AS day, d.c,
               CAST(d.trend4 AS BIGINT) AS trend4,
               s.seasonal4,
               CAST(d.det4 - s.seasonal4 AS BIGINT) AS remainder4
        FROM det d JOIN seas s USING (dow)
        ORDER BY day
    """,
    tags=("events", "time-series", "decomposition"),
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily event series:
    trend = centered 7-day moving average (exact: (Σc·10⁴) div 7 on
    BIGINTs, emitted only where the full window exists), weekly
    seasonal = per-day-of-week mean of the detrended series (floored
    via the double route — integer div would round toward zero on
    negative residuals where DuckDB floors), remainder = what's left.
    The classic STL-lite every metrics pipeline runs before anomaly
    thresholds, entirely transcendental-free.

    Scale shape: events reduce to |days| rows map-side; all windows
    and joins run on that bounded calendar series (the accepted
    events_daily_delta shape). The seasonal table is 7 rows,
    broadcast."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "c",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.expr("(sum(c) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING"
                   " AND 3 FOLLOWING) * 10000) div 7"),
        ).alias("trend4"),
        F.dayofweek("day").cast("long").alias("dow"),
    )
    det = ma.withColumn("det4", F.col("c") * 10000 - F.col("trend4"))
    seas = (
        det.filter(F.col("det4").isNotNull())
        .groupBy("dow")
        .agg(
            F.floor(
                F.sum("det4").cast("double") / F.count("det4")
            )
            .cast("long")
            .alias("seasonal4")
        )
    )
    return (
        det.join(F.broadcast(seas), "dow")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "c",
            "trend4",
            "seasonal4",
            (F.col("det4") - F.col("seasonal4")).alias("remainder4"),
        )
        .orderBy("day")
    )


@register(
    "agg_banded_moments",
    oracle="""
        WITH banded AS (
            SELECT o_orderpriority AS priority,
                   CAST(floor(o_totalprice / 1000) AS BIGINT) AS y
            FROM orders
        ),
        sums AS (
            SELECT priority,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS s1,
                   CAST(sum(y*y) AS BIGINT) AS s2,
                   CAST(sum(y*y*y) AS BIGINT) AS s3,
                   CAST(sum(y*y*y*y) AS BIGINT) AS s4
            FROM banded GROUP BY 1
        )
        SELECT priority, n,
               CAST(floor(10000 * (CAST(s3 AS DOUBLE)/n
                        - 3*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n
                            - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
                        - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)
                          *(CAST(s1 AS DOUBLE)/n))
                    / ((CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)
                        *(CAST(s1 AS DOUBLE)/n))
                       * sqrt(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)
                              *(CAST(s1 AS DOUBLE)/n)))) AS BIGINT) AS skew4,
               CAST(floor(10000 * (CAST(s4 AS DOUBLE)/n
                        - 4*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n)
                        + 6*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)
                          *(CAST(s2 AS DOUBLE)/n)
                        - 3*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)
                          *(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
                    / ((CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)
                        *(CAST(s1 AS DOUBLE)/n))
                       * (CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)
                          *(CAST(s1 AS DOUBLE)/n)))) AS BIGINT) AS kurt4
        FROM sums ORDER BY priority
    """,
    tags=("aggregate", "statistics", "moments"),
)
def agg_banded_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and kurtosis per group from exact raw moment sums —
    the 3rd/4th-moment completion of the covar/corr fixed-point family
    (native skewness()/kurtosis() accumulate doubles in partial order;
    these derive from exact BIGINT Σy..Σy⁴ over 1000-unit price bands,
    bounded so Σy⁴ fits int64 through ~sf10). Every double op in the
    final formulas (Fisher skew, Pearson kurtosis) is a
    correctly-rounded IEEE step shared verbatim with the oracle.

    Scale: one map-side-combining aggregate to |groups| rows; the
    moment formulas run on 5 numbers per group."""
    o = load_table(spark, sf_dir, "orders")
    y = F.floor(F.col("o_totalprice") / 1000).cast("long")
    sums = o.select(
        F.col("o_orderpriority").alias("priority"), y.alias("y")
    ).groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s1"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("s2"),
        F.sum(F.col("y") * F.col("y") * F.col("y")).cast("long").alias("s3"),
        F.sum(F.col("y") * F.col("y") * F.col("y") * F.col("y"))
        .cast("long")
        .alias("s4"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    m2r = F.col("s2").cast("double") / nd
    m3r = F.col("s3").cast("double") / nd
    m4r = F.col("s4").cast("double") / nd
    var = m2r - m1 * m1
    m3c = m3r - 3 * m1 * var - m1 * m1 * m1
    m4c = m4r - 4 * m1 * m3r + 6 * m1 * m1 * m2r - 3 * m1 * m1 * m1 * m1
    return sums.select(
        "priority",
        "n",
        F.floor(10000 * m3c / (var * F.sqrt(var))).cast("long").alias("skew4"),
        F.floor(10000 * m4c / (var * var)).cast("long").alias("kurt4"),
    ).orderBy("priority")


_NEAR_TOL_US = 600_000_000  # ±10 minutes


@register(
    "join_asof_nearest",
    oracle=f"""
        WITH p AS (
            SELECT event_id AS pid, user_id, epoch_us(ts) AS pus
            FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT event_id AS cid, user_id, epoch_us(ts) AS cus
            FROM events WHERE event_type = 'click'
        ),
        cand AS (
            SELECT p.pid, p.user_id, c.cid,
                   c.cus - p.pus AS diff_us,
                   row_number() OVER (
                       PARTITION BY p.pid
                       ORDER BY abs(c.cus - p.pus), c.cus, c.cid) AS rn
            FROM p JOIN c ON p.user_id = c.user_id
             AND abs(c.cus - p.pus) <= {_NEAR_TOL_US}
        )
        SELECT pid, user_id, cid, diff_us
        FROM cand WHERE rn = 1
        ORDER BY pid
    """,
    tags=("join", "asof", "time"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join, BOTH directions with tolerance:
    each purchase pairs with its temporally closest click by the same
    user within ±10 minutes (ties: earlier click, then id) — the
    symmetric sibling of join_asof_prev_purchase (backward-only) and
    the argmin refinement of join_time_proximity_bucketed (all
    pairs).

    Scale shape: candidates come from an EQUI join on
    (user_id, time-bucket) with each purchase probing its own and
    both adjacent 10-minute buckets (any match within tolerance is
    within ±1 bucket), so candidate volume is per-user-per-window
    density, never |purchases|×|clicks|; the argmin window partitions
    per purchase id over those few candidates. The oracle spells the
    same semantics as a plain theta join (fine single-node)."""
    from kafkastreamer_spark.queries._util import epoch_us

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        epoch_us(F.col("ts")).alias("pus"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("cuser"),
        epoch_us(F.col("ts")).alias("cus"),
    )
    pb = p.select(
        "*",
        F.explode(
            F.array(
                (F.col("pus") / _NEAR_TOL_US).cast("long") - 1,
                (F.col("pus") / _NEAR_TOL_US).cast("long"),
                (F.col("pus") / _NEAR_TOL_US).cast("long") + 1,
            )
        ).alias("bkt"),
    )
    cb = c.withColumn("cbkt", (F.col("cus") / _NEAR_TOL_US).cast("long"))
    cand = pb.join(
        cb,
        (F.col("user_id") == F.col("cuser"))
        & (F.col("bkt") == F.col("cbkt"))
        & (F.abs(F.col("cus") - F.col("pus")) <= _NEAR_TOL_US),
    )
    w = Window.partitionBy("pid").orderBy(
        F.abs(F.col("cus") - F.col("pus")), "cus", "cid"
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "pid", "user_id", "cid", (F.col("cus") - F.col("pus")).alias("diff_us")
        )
        .orderBy("pid")
    )


@register(
    "window_distinct_trailing",
    oracle="""
        SELECT event_id, user_id,
               CAST(len(list_distinct(list(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)))
                   AS BIGINT) AS n_distinct_5
        FROM events
        ORDER BY event_id
    """,
    tags=("window", "distinct", "events"),
)
def window_distinct_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) over a window frame — which no SQL engine's
    window aggregate supports directly (distinct doesn't merge across
    frames): per user, the number of distinct event types in the
    trailing 5 rows, via collect_list over the frame + array_distinct
    (DuckDB mirrors with list()/list_distinct). The behavioral-variety
    signal behind "is this session exploring or stuck" features.

    Scale note: the frame is 5 rows, so the collected array is
    O(frame) per row — this pattern is safe exactly when the frame is
    small and bounded (an unbounded-preceding variant would
    materialize whole partitions per row; events_cumulative_-
    distinct_users does that computation shuffle-side instead)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
        .cast("long")
        .alias("n_distinct_5"),
    ).orderBy("event_id")


@register(
    "embedding_centroid_drift",
    oracle="""
        WITH dims AS (
            SELECT label, i AS d,
                   CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
                       AS fx
            FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
        ),
        per_label AS (
            SELECT label, d, CAST(sum(fx) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM dims GROUP BY 1, 2
        ),
        gctr AS (
            SELECT d, CAST(sum(s) AS BIGINT) AS g, CAST(sum(n) AS BIGINT) AS m
            FROM per_label GROUP BY d
        ),
        terms AS (
            SELECT p.label, p.n,
                   CAST(floor(100000000 *
                        (CAST(p.s AS DOUBLE) / p.n - CAST(g.g AS DOUBLE) / g.m)
                        * (CAST(p.s AS DOUBLE) / p.n - CAST(g.g AS DOUBLE) / g.m))
                        AS BIGINT) AS t8
            FROM per_label p JOIN gctr g USING (d)
        )
        SELECT CAST(label AS BIGINT) AS label,
               CAST(max(n) AS BIGINT) AS n_vectors,
               CAST(sum(t8) AS BIGINT) AS dist_sq8
        FROM terms GROUP BY label ORDER BY label
    """,
    tags=("llm-data", "embedding", "drift"),
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift from the corpus centroid — the
    embedding-space monitoring statistic behind "did this slice's
    representation shift" checks (covariate drift between data
    sources, before/after a re-embed). Exact across engines despite
    float vectors: per-dimension fixed-point components sum to exact
    BIGINTs, each dimension's squared mean-difference is floored to
    fixed-point as ONE deterministic double expression, and only
    those BIGINTs are summed — so neither partial-aggregation order
    nor dimension order can perturb the result (the naive Σ(μᵢ−γᵢ)²
    double sum would).

    Scale shape: the (vector → dimension) explode is map-only and the
    per-(label, dim) aggregate map-side combines to |labels|×64 rows;
    everything after runs on that tiny frame. The global centroid is
    re-reduced from the per-label sums, not a second corpus pass."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", F.posexplode("embedding").alias("d", "v")
    ).select(
        "label",
        "d",
        F.floor(F.col("v").cast("double") * 10000).cast("long").alias("fx"),
    )
    per_label = dims.groupBy("label", "d").agg(
        F.sum("fx").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    glob = per_label.groupBy("d").agg(
        F.sum("s").cast("long").alias("g"), F.sum("n").cast("long").alias("m")
    )
    diff = (
        F.col("s").cast("double") / F.col("n")
        - F.col("g").cast("double") / F.col("m")
    )
    terms = per_label.join(glob, "d").select(
        "label",
        "n",
        F.floor(100000000 * diff * diff).cast("long").alias("t8"),
    )
    return (
        terms.groupBy("label")
        .agg(
            F.max("n").cast("long").alias("n_vectors"),
            F.sum("t8").cast("long").alias("dist_sq8"),
        )
        .select(F.col("label").cast("long").alias("label"), "n_vectors", "dist_sq8")
        .orderBy("label")
    )


_SHARED_SQL_GAPS = """
    WITH du AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    seq AS (
        SELECT user_id, d,
               lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
        FROM du
    ),
    gaps AS (
        SELECT user_id,
               CAST(floor((epoch_us(CAST(d AS TIMESTAMP))
                           - epoch_us(CAST(prev_d AS TIMESTAMP)))
                          / CAST(86400000000 AS DOUBLE)) AS BIGINT)
                   AS gap_days
        FROM seq WHERE prev_d IS NOT NULL
    )
    SELECT gap_days, CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM gaps GROUP BY gap_days ORDER BY gap_days
"""


@register(
    "sql_text_shared_dialect_gaps",
    oracle=_SHARED_SQL_GAPS,
    tags=("sql-surface", "events", "window"),
)
def sql_text_shared_dialect_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-string surface proof #3, time-series form: LAG over a
    DISTINCT reduction and a date_diff histogram, one shared-dialect
    ANSI string executed verbatim by BOTH engines (see
    sql_text_shared_dialect_rollup for the mechanism). the gap arithmetic
    rides the shared ``epoch_us`` helper (a DuckDB driver macro,
    mirrored as a Spark SQL scalar UDF by ``run_sql``) because date
    subtraction is NOT in the dialect intersection — DuckDB yields an
    INTERVAL and the engines disagree on date_diff's unit spelling;
    exactly the portability trap this entry pins.

    Scale: DISTINCT pairs reduce map-side; the LAG window partitions
    per user over calendar days."""
    from kafkastreamer_spark.sql import run_sql

    return run_sql(spark, sf_dir, _SHARED_SQL_GAPS)


@register(
    "scalar_collation_ci",
    oracle="""
        WITH named AS (
            SELECT CASE WHEN n_nationkey % 3 = 0 THEN upper(n_name)
                        WHEN n_nationkey % 3 = 1 THEN lower(n_name)
                        ELSE n_name END AS display_name,
                   n_name
            FROM nation
        )
        SELECT lower(display_name) AS name_ci,
               CAST(count(*) AS BIGINT) AS n,
               min(display_name) AS first_variant
        FROM named
        GROUP BY lower(display_name)
        ORDER BY name_ci
    """,
    tags=("scalar", "collation", "sql-surface"),
)
def scalar_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 COLLATIONS: the mixed-case
    display names group under ``collate(name, 'UTF8_LCASE')`` — the
    engine-native way to get CI semantics without rewriting every
    predicate through lower() (the oracle uses lower(), the dialect
    intersection; the point is that Spark's collated grouping agrees
    with it on ASCII data). Output columns are plain lowercase strings
    so the value-hash sees identical bytes from both engines.

    Scale note: collated grouping hashes the collation key exactly
    like any groupBy — map-side combine intact; at 100 TB prefer the
    collated column over wrapping every reference in lower() so
    predicate pushdown still sees the raw column."""
    n = load_table(spark, sf_dir, "nation")
    named = n.select(
        F.when(F.col("n_nationkey") % 3 == 0, F.upper("n_name"))
        .when(F.col("n_nationkey") % 3 == 1, F.lower("n_name"))
        .otherwise(F.col("n_name"))
        .alias("display_name")
    )
    grouped = named.groupBy(
        F.collate("display_name", "UTF8_LCASE").alias("ci_key")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("display_name").alias("first_variant"),
    )
    return grouped.select(
        F.lower(F.col("ci_key").cast("string")).alias("name_ci"),
        "n",
        "first_variant",
    ).orderBy("name_ci")


@register(
    "split_kfold_assign",
    oracle="""
        WITH folded AS (
            SELECT doc_id,
                   CAST(instr('0123456789abcdef',
                              substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                        AS BIGINT) % 5 AS fold
            FROM documents
        )
        SELECT fold, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(doc_id) AS BIGINT) AS min_doc,
               CAST(max(doc_id) AS BIGINT) AS max_doc
        FROM folded GROUP BY fold ORDER BY fold
    """,
    tags=("sampling", "training-data", "splits"),
)
def split_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (k=5): fold = first md5 hex
    digit of the id, mod k — the same engine/partition/scale-invariant
    membership discipline as split_train_valid_test, extended to
    cross-validation. Any engine recomputes identical folds from ids
    alone (no stored assignment table), so fold membership survives
    re-partitioning, re-ingestion, and engine swaps.

    Scale: pure map-side projection + one tiny aggregate."""
    d = load_table(spark, sf_dir, "documents")
    fold = (
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
            ).cast("long")
        )
        % 5
    ).alias("fold")
    return (
        d.select("doc_id", fold)
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .orderBy("fold")
    )


@register(
    "features_target_encoding_loo",
    oracle="""
        WITH fx AS (
            SELECT o_orderkey, o_orderpriority AS cat,
                   CAST(floor(o_totalprice * 10000) AS BIGINT) AS t4
            FROM orders
        ),
        stats AS (
            SELECT cat, CAST(sum(t4) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM fx GROUP BY cat
        )
        SELECT f.o_orderkey, f.cat,
               CAST(floor(CAST(s.s - f.t4 AS DOUBLE) / (s.n - 1))
                    AS BIGINT) AS loo_enc4
        FROM fx f JOIN stats s ON s.cat = f.cat
        ORDER BY f.o_orderkey
    """,
    tags=("features", "training-data", "encoding"),
)
def features_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the leakage-free categorical
    feature: each row's category is encoded as the mean target of all
    OTHER rows in the category, (Σ − own)/(n−1), so a row never sees
    its own label. Exact: fixed-point targets sum to BIGINTs per
    category and each row's encoding is one correctly-rounded double
    division, floored.

    Scale: one map-side aggregate to |categories| rows, broadcast
    back onto the fact scan — the encoding is a projection, not a
    second shuffle."""
    o = load_table(spark, sf_dir, "orders")
    fx = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("cat"),
        F.floor(F.col("o_totalprice") * 10000).cast("long").alias("t4"),
    )
    stats = fx.groupBy("cat").agg(
        F.sum("t4").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        fx.join(F.broadcast(stats), "cat")
        .select(
            "o_orderkey",
            "cat",
            F.floor(
                (F.col("s") - F.col("t4")).cast("double") / (F.col("n") - 1)
            )
            .cast("long")
            .alias("loo_enc4"),
        )
        .orderBy("o_orderkey")
    )


_CONC_SPAN_US = 600_000_000  # each event holds a resource for 10 min


@register(
    "events_peak_concurrency",
    oracle=f"""
        WITH iv AS (
            SELECT CAST(ts AS DATE) AS day,
                   epoch_us(ts) AS s, epoch_us(ts) + {_CONC_SPAN_US} AS e
            FROM events
        ),
        deltas AS (
            SELECT day, s // 60000000 AS minute, 1 AS d FROM iv
            UNION ALL
            SELECT day, e // 60000000 AS minute, -1 FROM iv
        ),
        per_min AS (
            SELECT day, minute, CAST(sum(d) AS BIGINT) AS net
            FROM deltas GROUP BY day, minute
        ),
        run AS (
            SELECT day, minute,
                   CAST(sum(net) OVER (PARTITION BY day ORDER BY minute
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS conc
            FROM per_min
        ),
        peak AS (
            SELECT day, conc, minute,
                   row_number() OVER (PARTITION BY day
                                      ORDER BY conc DESC, minute) AS rn
            FROM run
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               conc AS peak_concurrency,
               CAST(minute % 1440 AS BIGINT) AS peak_minute_of_day
        FROM peak WHERE rn = 1
        ORDER BY day
    """,
    tags=("events", "time-series", "sweep-line"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via sweep line: each event holds a resource
    for 10 minutes; +1/−1 deltas at interval ends, pre-aggregated to
    NET CHANGE PER MINUTE, then a running sum finds each day's peak
    simultaneous holders and when it occurred — capacity planning's
    core question, and the aggregate dual of join_interval_overlap
    (which enumerates the overlapping pairs this query only counts).

    Scale shape: the delta stream collapses to ≤ 2·1440 rows per day
    by an ordinary map-side-combining aggregate BEFORE any window —
    the running sum orders a bounded per-day minute series no matter
    how many events the day holds (day-boundary spillover of the
    10-minute holds is ignored by construction — documented, exact in
    both engines). Cross-midnight analyses re-anchor day to the
    interval start, same plan."""
    from kafkastreamer_spark.queries._util import epoch_us

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        F.to_date("ts").alias("day"),
        epoch_us(F.col("ts")).alias("s"),
        (epoch_us(F.col("ts")) + _CONC_SPAN_US).alias("e"),
    )
    deltas = iv.select(
        "day", F.expr("s div 60000000").alias("minute"), F.lit(1).alias("d")
    ).unionAll(
        iv.select(
            "day", F.expr("e div 60000000").alias("minute"), F.lit(-1).alias("d")
        )
    )
    per_min = deltas.groupBy("day", "minute").agg(
        F.sum("d").cast("long").alias("net")
    )
    wrun = (
        Window.partitionBy("day")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = per_min.withColumn("conc", F.sum("net").over(wrun).cast("long"))
    wpk = Window.partitionBy("day").orderBy(F.desc("conc"), "minute")
    return (
        run.withColumn("rn", F.row_number().over(wpk))
        .filter(F.col("rn") == 1)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("conc").alias("peak_concurrency"),
            (F.col("minute") % 1440).cast("long").alias("peak_minute_of_day"),
        )
        .orderBy("day")
    )


@register(
    "orders_otif_rate",
    oracle="""
        WITH lines AS (
            SELECT l.l_orderkey,
                   bool_and(l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY)
                       AS all_on_time
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY l.l_orderkey
        )
        SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(*) FILTER (WHERE l.all_on_time) AS BIGINT)
                   AS n_otif,
               CAST(floor(CAST(count(*) FILTER (WHERE l.all_on_time)
                    AS DOUBLE) * 10000 / count(*)) AS BIGINT) AS otif_pct4
        FROM orders o JOIN lines l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1 ORDER BY month
    """,
    tags=("relational", "aggregate", "kpi"),
)
def orders_otif_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-Time-In-Full rate per order month — the supply-chain KPI:
    an order counts as OTIF only if EVERY line shipped within 60 days
    of the order date (``every``/``bool_and``, the universally-
    quantified aggregate no battery query exercises standalone).
    Fixed-point percentage.

    Scale: the lineitem-orders join is the one big shuffle (q4's
    shape); lines then reduce per order with a map-side-combining
    bool_and, and the month rollup carries one boolean per order."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lines = (
        li.join(
            o.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.every(
                F.col("l_shipdate") <= F.date_add(F.col("o_orderdate"), 60)
            ).alias("all_on_time")
        )
    )
    return (
        o.join(lines, o.o_orderkey == lines.l_orderkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.count(F.when(F.col("all_on_time"), 1))
            .cast("long")
            .alias("n_otif"),
        )
        .withColumn(
            "otif_pct4",
            F.floor(
                F.col("n_otif").cast("double") * 10000 / F.col("n_orders")
            ).cast("long"),
        )
        .orderBy("month")
    )


@register(
    "features_hashing_trick",
    oracle=f"""
        WITH words AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
        toks AS (SELECT doc_id, unnest(w) AS t FROM words),
        hashed AS (
            SELECT doc_id,
                   CAST((instr('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 16
                        + instr('0123456789abcdef', substr(md5(t), 2, 1)) - 1
                        AS BIGINT) % 64 AS dim
            FROM toks
        )
        SELECT doc_id, dim, CAST(count(*) AS BIGINT) AS cnt
        FROM hashed GROUP BY doc_id, dim
        ORDER BY doc_id, dim
    """,
    tags=("features", "training-data", "text"),
)
def features_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick): project the unbounded
    token vocabulary onto a fixed 64-dimension count vector via
    ``md5(token) mod 64`` — the vocabulary-free featurization linear
    models and wide-and-deep pipelines use when a dictionary is
    impractical. Emitted as sparse (doc, dim, count) triples — the
    layout a trainer ingests directly, and what keeps the output
    linear in token volume rather than |docs|×64 dense.

    Engine-invariance: the dimension is a pure function of the token
    bytes, so any engine/partitioning reproduces identical vectors —
    the same md5-membership discipline as the samplers.

    Scale: tokenize map-only, one map-side-combining aggregate on
    (doc, dim)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("t"))
    dim = (
        F.conv(F.substring(F.md5("t"), 1, 2), 16, 10).cast("long") % 64
    ).alias("dim")
    return (
        toks.select("doc_id", dim)
        .groupBy("doc_id", "dim")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy("doc_id", "dim")
    )


@register(
    "dedup_cross_source_matrix",
    oracle="""
        WITH words AS (
            SELECT source, string_split_regex(lower(text), '\\s+') AS w
            FROM documents
        ),
        hashed AS (
            SELECT DISTINCT md5(array_to_string(w[1:8], ' ')) AS h, source
            FROM words
        ),
        pairs AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*) AS n_shared
            FROM hashed a JOIN hashed b
              ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT source_a, source_b, CAST(n_shared AS BIGINT) AS n_shared
        FROM pairs
        ORDER BY source_a, source_b
    """,
    tags=("llm-data", "dedup", "reporting"),
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate overlap matrix: for every source pair,
    how many 8-token prefix fingerprints both contain (the standard
    head-fingerprint blocking key — tolerant of tail edits, strict on
    shared openings) — the provenance view of dedup (dedup_exact
    collapses copies; this shows
    WHICH ingestion feeds mirror each other, the signal for dropping
    a wholesale-duplicated feed instead of deduping it row by row).

    Scale shape: documents reduce to DISTINCT (hash, source) pairs —
    32-byte keys — and the self-join on hash is bounded per hash by
    C(|sources|, 2) (sources are a small set by construction; a
    web-scale run caps per-hash source lists exactly like the
    md5-rank degree caps). Upper-triangle only via source_a <
    source_b."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(
        F.concat_ws(" ", F.slice(tokens("text"), 1, 8))
    ).alias("h")
    hashed = d.select(h, "source").distinct().persist()
    b = hashed.select(F.col("h").alias("hb"), F.col("source").alias("source_b"))
    return (
        hashed.withColumnRenamed("source", "source_a")
        .join(
            b,
            (F.col("h") == F.col("hb"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .orderBy("source_a", "source_b")
    )


@register(
    "events_autocorrelation_lag7",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        lagged AS (
            SELECT c AS x,
                   lag(c, 7) OVER (ORDER BY day) AS y
            FROM daily
        ),
        pairs AS (SELECT x, y FROM lagged WHERE y IS NOT NULL),
        sums AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM pairs
        )
        SELECT n,
               CAST(floor(10000 *
                    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                    / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                           * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
                    AS BIGINT) AS acf7_4
        FROM sums
    """,
    tags=("events", "time-series", "statistics"),
)
def events_autocorrelation_lag7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-7 autocorrelation of the daily event-count series — the
    weekly-periodicity detector (ACF spike at 7 = strong day-of-week
    structure; the statistic events_seasonal_decompose's weekly model
    presumes). Exact: daily counts are integers, so all five moment
    sums over (cₜ, cₜ₋₇) pairs are exact BIGINTs and the correlation
    is formed in correctly-rounded double ops shared verbatim with
    the oracle — the same discipline as lineitem_spearman_rho.

    Scale shape: events reduce to |days| rows map-side; the LAG and
    the 6-number reduce run on the bounded calendar series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lagged = daily.select(
        F.col("c").alias("x"),
        F.lag("c", 7).over(Window.orderBy("day")).alias("y"),
    ).filter(F.col("y").isNotNull())
    sums = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = nd * F.col("sxy") - sxd * F.col("sy")
    vx = nd * F.col("sxx") - sxd * F.col("sx")
    vy = nd * F.col("syy") - syd * F.col("sy")
    return sums.select(
        "n",
        F.floor(10000 * num / F.sqrt(vx * vy)).cast("long").alias("acf7_4"),
    )


@register(
    "split_group_kfold",
    oracle="""
        WITH folded AS (
            SELECT doc_id, source,
                   CAST(instr('0123456789abcdef',
                              substr(md5(source), 1, 1)) - 1
                        AS BIGINT) % 5 AS fold
            FROM documents
        )
        SELECT fold,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT source) AS BIGINT) AS n_groups
        FROM folded GROUP BY fold ORDER BY fold
    """,
    tags=("sampling", "training-data", "splits"),
)
def split_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group k-fold assignment: the fold hashes the GROUP key
    (source), not the row id, so every document from one source lands
    in the same fold — the leakage guard plain k-fold
    (split_kfold_assign) lacks when near-duplicate rows cluster
    within groups: a source's boilerplate can never sit on both sides
    of a validation split. Same md5 membership discipline, so
    assignment is engine/partition/scale-invariant.

    Scale: map-side projection + one tiny aggregate (the distinct
    group count per fold is bounded by |sources|)."""
    d = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5("source"), 1, 1), 16, 10).cast("long") % 5
    ).alias("fold")
    return (
        d.select("doc_id", "source", fold)
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("source").cast("long").alias("n_groups"),
        )
        .orderBy("fold")
    )


@register(
    "agg_decimal128_bigsum",
    oracle="""
        SELECT o_orderpriority AS priority,
               CAST(sum(CAST(CAST(floor(o_totalprice * 10000) AS BIGINT)
                        AS DECIMAL(38, 0)) * 100000000) AS DECIMAL(38, 0))
                   AS pico_total,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1 ORDER BY priority
    """,
    tags=("aggregate", "decimal", "exactness"),
)
def agg_decimal128_bigsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-bit exact accumulation — the overflow escape hatch the
    BIGINT fixed-point discipline needs at extreme scale: each value
    becomes an exact picounit integer (fixed4 × 10⁸) whose corpus sum
    exceeds int64 headroom around ~10⁵ rows, carried in DECIMAL(38,0)
    (Spark's 128-bit decimal ↔ DuckDB's HUGEINT-backed DECIMAL —
    integer-exact in both, unlike double→DECIMAL casts whose rounding
    modes differ; the chain here is floor→BIGINT→DECIMAL, every step
    exact). This is the documented upgrade path for
    lineitem_spearman_rho-class moment sums beyond ~2M rows.

    Scale: an ordinary map-side-combining aggregate; decimal partials
    are 16 bytes instead of 8."""
    o = load_table(spark, sf_dir, "orders")
    pico = (
        F.floor(F.col("o_totalprice") * 10000)
        .cast("long")
        .cast("decimal(38,0)")
        * 100000000
    )
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum(pico).cast("decimal(38,0)").alias("pico_total"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("priority")
    )


@register(
    "events_changepoint_single",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        idx AS (
            SELECT day, c,
                   CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
                   CAST(sum(c) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS ps
            FROM daily
        ),
        tot AS (
            SELECT CAST(max(i) AS BIGINT) AS n, CAST(max(ps) AS BIGINT) AS s
            FROM idx
        ),
        gains AS (
            SELECT day, i,
                   CAST(floor(
                        (CAST(ps AS DOUBLE) * ps) / i
                        + (CAST(s - ps AS DOUBLE) * (s - ps)) / (n - i)
                        - (CAST(s AS DOUBLE) * s) / n) AS BIGINT) AS gain
            FROM idx, tot
            WHERE i < n
        )
        SELECT strftime(day, '%Y-%m-%d') AS split_day,
               CAST(i AS BIGINT) AS left_days, gain
        FROM gains
        ORDER BY gain DESC, split_day
        LIMIT 1
    """,
    tags=("events", "time-series", "changepoint"),
)
def events_changepoint_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection (binary segmentation's first
    split): the day boundary that maximizes the between-segment
    sum-of-squares gain ps²/i + (s−ps)²/(n−i) − s²/n — equivalently
    the split minimizing within-segment variance of the daily count
    series. Prefix sums make every candidate split O(1), so the whole
    scan is one window pass over the bounded calendar series; gains
    are formed from exact BIGINT prefix sums with three
    correctly-rounded double divisions, floored. Iterating on each
    side yields full binary segmentation — one level is registered so
    the oracle stays a finite query.

    Scale: events reduce to |days| map-side; everything after is
    |days| rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    idx = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        F.sum("c").over(w).cast("long").alias("ps"),
    )
    tot = idx.agg(
        F.max("i").cast("long").alias("n"), F.max("ps").cast("long").alias("s")
    )
    psd = F.col("ps").cast("double")
    rd = (F.col("s") - F.col("ps")).cast("double")
    gains = (
        idx.crossJoin(F.broadcast(tot))
        .filter(F.col("i") < F.col("n"))
        .select(
            "day",
            "i",
            F.floor(
                psd * F.col("ps") / F.col("i")
                + rd * (F.col("s") - F.col("ps")) / (F.col("n") - F.col("i"))
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
            .cast("long")
            .alias("gain"),
        )
    )
    return (
        gains.orderBy(F.desc("gain"), "day")
        .limit(1)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("split_day"),
            F.col("i").alias("left_days"),
            "gain",
        )
    )


@register(
    "embedding_power_iteration_step",
    oracle="""
        WITH dims AS (
            SELECT vec_id, i AS d,
                   CAST(embedding[i] AS DOUBLE) AS x,
                   CAST(embedding[1] AS DOUBLE) AS x1
            FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
        ),
        contrib AS (
            SELECT d,
                   CAST(sum(CAST(floor(10000 * x * x1) AS BIGINT)) AS BIGINT)
                       AS v4
            FROM dims GROUP BY d
        )
        SELECT CAST(d AS BIGINT) AS dim, v4, abs(v4) AS mag4
        FROM contrib
        ORDER BY abs(v4) DESC, d
        LIMIT 8
    """,
    tags=("llm-data", "embedding", "linear-algebra"),
)
def embedding_power_iteration_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One matrix-free power-iteration step toward the corpus's top
    principal direction: v₁ = Σ_docs x·(x·e₁) starting from the unit
    basis vector e₁ — i.e. column 1 of the Gram matrix XᵀX, computed
    without ever materializing it. Per (doc, dim) the contribution
    x_d·x_1 is floored to fixed-point as one deterministic double
    product, then summed exactly in BIGINTs, so neither aggregation
    nor dimension order perturbs the vector (the embedding_-
    centroid_drift discipline applied to second moments). Top-8
    dimensions by magnitude.

    Scale: the explode is map-only; the per-dim aggregate map-side
    combines to 64 rows. Full PCA iterates this against the running
    normalized vector (broadcast, like the k-means centroids) —
    one corpus pass per iteration, the standard distributed
    formulation."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        F.posexplode("embedding").alias("d0", "x"),
        F.element_at("embedding", 1).alias("x1"),
    ).select(
        (F.col("d0") + 1).cast("long").alias("d"),
        F.col("x").cast("double").alias("x"),
        F.col("x1").cast("double").alias("x1"),
    )
    contrib = dims.groupBy("d").agg(
        F.sum(F.floor(10000 * F.col("x") * F.col("x1")).cast("long"))
        .cast("long")
        .alias("v4")
    )
    return (
        contrib.select(F.col("d").alias("dim"), "v4", F.abs("v4").alias("mag4"))
        .orderBy(F.desc("mag4"), "dim")
        .limit(8)
    )


@register(
    "embedding_jl_projection",
    oracle="""
        WITH dims AS (
            SELECT vec_id, i AS d, CAST(embedding[i] AS DOUBLE) AS x
            FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
        ),
        signed AS (
            SELECT vec_id, j, d,
                   CASE WHEN instr('0123456789abcdef',
                            substr(md5('jl:' || j || ':' || d), 1, 1)) - 1 < 8
                        THEN x ELSE -x END AS sx
            FROM dims, unnest(range(1, 17)) AS u(j)
        )
        SELECT vec_id, CAST(j AS BIGINT) AS j,
               CAST(sum(CAST(floor(10000 * sx) AS BIGINT)) AS BIGINT) AS y4
        FROM signed GROUP BY vec_id, j
        ORDER BY vec_id, j
    """,
    tags=("llm-data", "embedding", "projection"),
)
def embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection 64→16 dims with a
    DETERMINISTIC ±1 matrix (sign = first md5 hex digit of "jl:j:d" —
    the same seedless md5 discipline as the LSH hyperplanes, so any
    engine regenerates the identical matrix from nothing): the cheap
    distance-preserving reduction that sits between full vectors and
    the learned truncations (matryoshka) / quantizations (PQ, int8)
    already in the registry. Per projected coordinate the signed
    components are floored to fixed-point then summed exactly, so
    aggregation order cannot perturb the output.

    Scale: the (vector → dim → 16 coordinates) expansion is map-only
    ×16; the aggregate map-side combines on (vec, j). At 100 TB you'd
    fold the 16 signs per dimension into one array literal broadcast
    (64×16 signs = 1 KB) and compute all coordinates in a single
    higher-order-function projection — same semantics, one pass; the
    explode form here keeps the oracle row-parallel."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode("embedding").alias("d0", "x")
    ).select(
        "vec_id",
        (F.col("d0") + 1).alias("d"),
        F.col("x").cast("double").alias("x"),
    )
    signed = dims.select(
        "vec_id",
        "d",
        "x",
        F.explode(F.sequence(F.lit(1), F.lit(16))).alias("j"),
    ).select(
        "vec_id",
        "j",
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("jl:"), F.col("j"), F.lit(":"), F.col("d"))),
                    1,
                    1,
                ),
                16,
                10,
            ).cast("long")
            < 8,
            F.col("x"),
        )
        .otherwise(-F.col("x"))
        .alias("sx"),
    )
    return (
        signed.groupBy("vec_id", "j")
        .agg(
            F.sum(F.floor(10000 * F.col("sx")).cast("long"))
            .cast("long")
            .alias("y4")
        )
        .select("vec_id", F.col("j").cast("long").alias("j"), "y4")
        .orderBy("vec_id", "j")
    )


@register(
    "orders_cohens_d",
    oracle="""
        WITH fx AS (
            SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END
                       AS grp,
                   CAST(floor(o_totalprice) AS BIGINT) AS y
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        sums AS (
            SELECT grp, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS s1,
                   CAST(sum(y * y) AS BIGINT) AS s2
            FROM fx GROUP BY grp
        ),
        wide AS (
            SELECT max(CASE WHEN grp = 'a' THEN n END) AS na,
                   max(CASE WHEN grp = 'a' THEN s1 END) AS sa1,
                   max(CASE WHEN grp = 'a' THEN s2 END) AS sa2,
                   max(CASE WHEN grp = 'b' THEN n END) AS nb,
                   max(CASE WHEN grp = 'b' THEN s1 END) AS sb1,
                   max(CASE WHEN grp = 'b' THEN s2 END) AS sb2
            FROM sums
        )
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CAST(floor(10000 *
                    (CAST(sa1 AS DOUBLE) / na - CAST(sb1 AS DOUBLE) / nb)
                    / sqrt(((CAST(sa2 AS DOUBLE)
                             - CAST(sa1 AS DOUBLE) * sa1 / na)
                            + (CAST(sb2 AS DOUBLE)
                               - CAST(sb1 AS DOUBLE) * sb1 / nb))
                           / (na + nb - 2))) AS BIGINT) AS cohens_d4
        FROM wide
    """,
    tags=("aggregate", "statistics", "effect-size"),
)
def orders_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d effect size between URGENT and LOW order prices —
    the parametric companion to orders_mann_whitney_u's rank test:
    the U test says WHETHER the distributions differ, d says by HOW
    MUCH in pooled-standard-deviation units (the number a sample-size
    calculation consumes). Exact BIGINT sums of whole-unit prices and
    squares per group; mean difference over the pooled SD formed in
    correctly-rounded double ops, floored to fixed-point.

    Scale: one two-row map-side aggregate, then scalar arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    fx = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", "a")
        .otherwise("b")
        .alias("grp"),
        F.floor("o_totalprice").cast("long").alias("y"),
    )
    sums = fx.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s1"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("s2"),
    )
    wide = sums.agg(
        F.max(F.when(F.col("grp") == "a", F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == "a", F.col("s1"))).alias("sa1"),
        F.max(F.when(F.col("grp") == "a", F.col("s2"))).alias("sa2"),
        F.max(F.when(F.col("grp") == "b", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("grp") == "b", F.col("s1"))).alias("sb1"),
        F.max(F.when(F.col("grp") == "b", F.col("s2"))).alias("sb2"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    mean_diff = F.col("sa1").cast("double") / na - F.col("sb1").cast("double") / nb
    ssa = F.col("sa2").cast("double") - F.col("sa1").cast("double") * F.col("sa1") / na
    ssb = F.col("sb2").cast("double") - F.col("sb1").cast("double") * F.col("sb1") / nb
    pooled = F.sqrt((ssa + ssb) / (na + nb - 2))
    return wide.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.floor(10000 * mean_diff / pooled).cast("long").alias("cohens_d4"),
    )


@register(
    "events_activity_deciles",
    oracle="""
        WITH per_user AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY user_id
        ),
        ranked AS (
            SELECT c, ntile(10) OVER (ORDER BY c, user_id) AS decile
            FROM per_user
        ),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM per_user)
        SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(c) AS BIGINT) AS n_events,
               CAST(floor(CAST(sum(c) AS DOUBLE) * 10000 / t) AS BIGINT)
                   AS share4
        FROM ranked, tot
        GROUP BY decile, t ORDER BY decile
    """,
    tags=("events", "aggregate", "deskew", "concentration"),
)
def events_activity_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration (the "1% rule" curve): users ranked into
    deciles by event count, each decile's share of total events — the
    per-user Lorenz view complementing customer_revenue_gini's single
    coefficient. The decile comes from the SAME closed-form-ntile-
    over-bucketed-rank machinery as agg_equidepth_histogram_sampled
    (range buckets on the count prefix), so no single-partition
    window ever sees the per-user table — at 100 TB |users| can be
    10⁹ rows and the plan shape holds.

    Scale: events reduce per user map-side; everything downstream
    runs on the per-user aggregate with the two-phase rank."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ranked = bucketed_row_number(
        per_user,
        [],
        F.floor(F.col("c") / 16).cast("long"),
        [F.col("c").asc(), F.col("user_id").asc()],
        "r",
        count_name="N",
    )
    decile = F.expr(
        """
        CASE WHEN r <= (N % 10) * (N div 10 + 1)
             THEN (r - 1) div (N div 10 + 1) + 1
             ELSE (N % 10) + (r - (N % 10) * (N div 10 + 1) - 1)
                              div (N div 10) + 1
        END
        """
    ).alias("decile")
    tot = per_user.agg(F.sum("c").cast("long").alias("t"))
    return (
        ranked.select("c", decile)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("c").cast("long").alias("n_events"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_users",
            "n_events",
            F.floor(F.col("n_events").cast("double") * 10000 / F.col("t"))
            .cast("long")
            .alias("share4"),
        )
        .orderBy("decile")
    )


@register(
    "part_abc_xyz_matrix",
    oracle="""
        WITH per_part AS (
            SELECT l_partkey AS part,
                   CAST(sum(CAST(floor(l_extendedprice * 10000) AS BIGINT))
                        AS BIGINT) AS rev4
            FROM lineitem GROUP BY 1
        ),
        monthly AS (
            SELECT l_partkey AS part, strftime(l_shipdate, '%Y-%m') AS m,
                   CAST(count(*) AS BIGINT) AS d
            FROM lineitem GROUP BY 1, 2
        ),
        var_stats AS (
            SELECT part, CAST(count(*) AS BIGINT) AS nm,
                   CAST(sum(d) AS BIGINT) AS sd,
                   CAST(sum(d * d) AS BIGINT) AS sd2
            FROM monthly GROUP BY part
        ),
        ranked AS (
            SELECT p.part, p.rev4, v.nm, v.sd, v.sd2,
                   CAST(row_number() OVER (ORDER BY p.rev4 DESC, p.part)
                        AS BIGINT) AS rk,
                   CAST(count(*) OVER () AS BIGINT) AS np
            FROM per_part p JOIN var_stats v ON v.part = p.part
        ),
        classed AS (
            SELECT CASE WHEN rk * 5 <= np THEN 'A'
                        WHEN rk * 2 <= np THEN 'B'
                        ELSE 'C' END AS abc,
                   CASE WHEN 4 * (nm * sd2 - sd * sd) <= sd * sd THEN 'X'
                        WHEN nm * sd2 - sd * sd <= sd * sd THEN 'Y'
                        ELSE 'Z' END AS xyz,
                   rev4
            FROM ranked
        )
        SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(rev4) AS BIGINT) AS rev4
        FROM classed GROUP BY abc, xyz ORDER BY abc, xyz
    """,
    tags=("relational", "aggregate", "inventory", "deskew"),
)
def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC×XYZ inventory classification matrix: parts classed by
    revenue rank (A = top 20%, B = to 50%, C = rest — rank-based ABC)
    crossed with demand variability (X/Y/Z = monthly-demand CV² ≤
    0.25 / ≤ 1 / above, via the integer cross-multiplication
    4(nΣd²−S²) ≤ S² — no float CV) — the planning grid that decides
    which SKUs get safety stock vs make-to-order. The revenue rank
    uses the de-skewed two-phase bucketed rank (desc), so the
    |parts|-sized table never sorts in one task.

    Scale: two map-side aggregates of lineitem (per part, per
    part-month), the bucketed rank, and a 9-row matrix out."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 10000).cast("long"))
        .cast("long")
        .alias("rev4")
    )
    monthly = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.date_format("l_shipdate", "yyyy-MM").alias("m"),
    ).agg(F.count(F.lit(1)).cast("long").alias("d"))
    var_stats = monthly.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("nm"),
        F.sum("d").cast("long").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sd2"),
    )
    joined = per_part.join(var_stats, "part")
    # total order = (rev4 DESC, part ASC); the bucket floor(rev4/2^24)
    # DESC is an order-consistent prefix, and the in-bucket sort
    # carries the full (rev4 DESC, part ASC) tail
    ranked = bucketed_row_number(
        joined,
        [],
        F.floor(F.col("rev4") / (1 << 24)).cast("long"),
        [F.col("rev4").desc(), F.col("part").asc()],
        "rk",
        count_name="np",
        bucket_desc=True,
    )
    classed = ranked.select(
        "rev4",
        "nm",
        "sd",
        "sd2",
        "rk",
        "np",
        F.when(F.col("rk") * 5 <= F.col("np"), "A")
        .when(F.col("rk") * 2 <= F.col("np"), "B")
        .otherwise("C")
        .alias("abc"),
        F.when(
            4 * (F.col("nm") * F.col("sd2") - F.col("sd") * F.col("sd"))
            <= F.col("sd") * F.col("sd"),
            "X",
        )
        .when(
            F.col("nm") * F.col("sd2") - F.col("sd") * F.col("sd")
            <= F.col("sd") * F.col("sd"),
            "Y",
        )
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        classed.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev4").cast("long").alias("rev4"),
        )
        .orderBy("abc", "xyz")
    )


@register(
    "events_bot_detection_rules",
    oracle="""
        WITH seq AS (
            SELECT user_id, epoch_us(ts) AS us,
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_us
            FROM events
        ),
        gaps AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS k,
                   CAST(sum((us - prev_us) // 1000000) AS BIGINT) AS sg,
                   CAST(sum(((us - prev_us) // 1000000)
                            * ((us - prev_us) // 1000000)) AS BIGINT) AS sg2
            FROM seq WHERE prev_us IS NOT NULL GROUP BY user_id
        ),
        vol AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id
        ),
        tc AS (
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        dom AS (
            SELECT user_id, CAST(max(c) AS BIGINT) AS mc FROM tc GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(n) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS u
            FROM vol
        ),
        scored AS (
            SELECT v.user_id, v.n, m.mc,
                   CASE WHEN 5 * v.n * u > 6 * t THEN 1 ELSE 0 END AS r_volume,
                   CASE WHEN g.k >= 5 AND
                             20 * (g.k * g.sg2 - g.sg * g.sg)
                             <= 13 * g.sg * g.sg
                        THEN 1 ELSE 0 END AS r_metronomic,
                   CASE WHEN m.mc * 10 >= 3 * v.n THEN 1 ELSE 0 END
                       AS r_dominant_type
            FROM vol v
            JOIN gaps g ON g.user_id = v.user_id
            JOIN dom m ON m.user_id = v.user_id, tot
        )
        SELECT user_id, n, mc,
               CAST(r_volume AS BIGINT) AS r_volume,
               CAST(r_metronomic AS BIGINT) AS r_metronomic,
               CAST(r_dominant_type AS BIGINT) AS r_dominant_type,
               CAST(r_volume + r_metronomic + r_dominant_type AS BIGINT)
                   AS bot_score
        FROM scored
        WHERE r_volume + r_metronomic + r_dominant_type >= 1
        ORDER BY bot_score DESC, user_id
    """,
    tags=("events", "quality", "anomaly"),
)
def events_bot_detection_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based bot scoring per user — the abuse-detection triage a
    data intake runs before training on behavioral logs: R1 volume
    (above 1.2× the average user's events, cross-multiplied
    5nU > 6T), R2 metronomic timing (inter-arrival CV² ≤ 0.65 over
    ≥5 gaps — machines fire on timers; whole-second integer gaps keep
    the squares in BIGINT), R3 dominant type (one event type ≥ 30% of
    the user's activity, mc·10 ≥ 3n). Thresholds sit in the fixture's
    tails so each rule has live positives at test scale. Flagged users carry
    their rule bits, so downstream can threshold or weigh.

    Scale: per-user LAG window (bounded per user), three map-side
    aggregates, a broadcast 1-row total. Every rule is an integer
    cross-multiplication — no float thresholds to drift across
    engines."""
    from kafkastreamer_spark.queries._util import epoch_us

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        epoch_us(F.col("ts")).alias("us"),
        F.lag(epoch_us(F.col("ts"))).over(w).alias("prev_us"),
    ).filter(F.col("prev_us").isNotNull())
    # whole-second gaps keep every square inside int64: s <= ~2.6e6 s
    # per user-month, s^2 <= 7e12, k*s2 well under 2^63
    gs = F.expr("(us - prev_us) div 1000000")
    gaps = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(gs).cast("long").alias("sg"),
        F.sum(gs * gs).cast("long").alias("sg2"),
    )
    vol = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    dom = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").cast("long").alias("mc"))
    )
    tot = vol.agg(
        F.sum("n").cast("long").alias("t"), F.count(F.lit(1)).cast("long").alias("u")
    )
    scored = (
        vol.join(gaps, "user_id")
        .join(dom, "user_id")
        .crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n",
            "mc",
            F.when(5 * F.col("n") * F.col("u") > 6 * F.col("t"), 1)
            .otherwise(0)
            .alias("r_volume"),
            F.when(
                (F.col("k") >= 5)
                & (
                    20 * (F.col("k") * F.col("sg2") - F.col("sg") * F.col("sg"))
                    <= 13 * F.col("sg") * F.col("sg")
                ),
                1,
            )
            .otherwise(0)
            .alias("r_metronomic"),
            F.when(F.col("mc") * 10 >= 3 * F.col("n"), 1)
            .otherwise(0)
            .alias("r_dominant_type"),
        )
    )
    score = (
        F.col("r_volume") + F.col("r_metronomic") + F.col("r_dominant_type")
    )
    return (
        scored.withColumn("bot_score", score.cast("long"))
        .filter(F.col("bot_score") >= 1)
        .select(
            "user_id",
            "n",
            "mc",
            F.col("r_volume").cast("long").alias("r_volume"),
            F.col("r_metronomic").cast("long").alias("r_metronomic"),
            F.col("r_dominant_type").cast("long").alias("r_dominant_type"),
            "bot_score",
        )
        .orderBy(F.desc("bot_score"), "user_id")
    )


@register(
    "orders_laspeyres_price_index",
    oracle="""
        WITH pm AS (
            SELECT l_partkey AS part, strftime(l_shipdate, '%Y-%m') AS m,
                   CAST(sum(CAST(floor(l_extendedprice * 10000) AS BIGINT))
                        AS BIGINT) AS e4,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
            FROM lineitem GROUP BY 1, 2
        ),
        priced AS (SELECT part, m, e4 // q AS p4, q FROM pm),
        base AS (
            SELECT part, p4 AS p0, q AS q0 FROM priced
            WHERE m = (SELECT min(m) FROM priced)
        ),
        idx AS (
            SELECT pr.m,
                   CAST(sum(pr.p4 * b.q0) AS BIGINT) AS cur,
                   CAST(sum(b.p0 * b.q0) AS BIGINT) AS ref
            FROM priced pr JOIN base b ON b.part = pr.part
            GROUP BY pr.m
        )
        SELECT m AS month,
               CAST(floor(CAST(cur AS DOUBLE) * 10000 / ref) AS BIGINT)
                   AS index4,
               cur AS basket_cur4, ref AS basket_base4
        FROM idx ORDER BY month
    """,
    tags=("relational", "aggregate", "economics"),
)
def orders_laspeyres_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index per ship month: the first month's part
    basket (quantities q₀) repriced at each month's unit prices —
    Σ pₜ·q₀ / Σ p₀·q₀, the CPI-style inflation measure over the
    catalog. Unit prices are exact integer micro-prices
    (Σe₄ div Σq per part-month — floor division, deterministic in
    both engines), so both basket totals are exact BIGINTs and only
    the final ratio is a correctly-rounded double, floored. Months
    missing a basket part simply skip it (fixed-basket semantics;
    the basket_cur4 column exposes the comparable totals).

    Scale: one map-side aggregate of lineitem per (part, month), the
    base-month slice broadcast onto the monthly price table, a
    |months|-row result."""
    li = load_table(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.date_format("l_shipdate", "yyyy-MM").alias("m"),
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 10000).cast("long"))
        .cast("long")
        .alias("e4"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"),
    )
    priced = pm.select(
        "part", "m", F.expr("e4 div q").alias("p4"), "q"
    ).persist()
    base_month = priced.agg(F.min("m").alias("m0"))
    base = (
        priced.join(F.broadcast(base_month), priced.m == F.col("m0"))
        .select("part", F.col("p4").alias("p0"), F.col("q").alias("q0"))
    )
    idx = (
        priced.join(base, "part")
        .groupBy("m")
        .agg(
            F.sum(F.col("p4") * F.col("q0")).cast("long").alias("cur"),
            F.sum(F.col("p0") * F.col("q0")).cast("long").alias("ref"),
        )
    )
    return idx.select(
        F.col("m").alias("month"),
        F.floor(F.col("cur").cast("double") * 10000 / F.col("ref"))
        .cast("long")
        .alias("index4"),
        F.col("cur").alias("basket_cur4"),
        F.col("ref").alias("basket_base4"),
    ).orderBy("month")


@register(
    "events_seasonal_naive_backtest",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        lagged AS (
            SELECT day, c,
                   lag(c, 1) OVER (ORDER BY day) AS f_naive,
                   lag(c, 7) OVER (ORDER BY day) AS f_seasonal
            FROM daily
        ),
        scored AS (
            SELECT c, f_naive, f_seasonal,
                   abs(c - f_naive) AS e_n, abs(c - f_seasonal) AS e_s,
                   CAST(floor(10000.0 * abs(c - f_naive) / c) AS BIGINT)
                       AS pe_n4,
                   CAST(floor(10000.0 * abs(c - f_seasonal) / c) AS BIGINT)
                       AS pe_s4
            FROM lagged WHERE f_seasonal IS NOT NULL
        )
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(e_n) AS BIGINT) AS sae_naive,
               CAST(sum(e_s) AS BIGINT) AS sae_seasonal,
               CAST(floor(CAST(sum(pe_n4) AS DOUBLE) / count(*)) AS BIGINT)
                   AS mape_naive4,
               CAST(floor(CAST(sum(pe_s4) AS DOUBLE) / count(*)) AS BIGINT)
                   AS mape_seasonal4,
               CASE WHEN sum(e_s) < sum(e_n) THEN 'seasonal' ELSE 'naive' END
                   AS winner
        FROM scored
    """,
    tags=("events", "time-series", "forecasting"),
)
def events_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest of the two no-model baselines every
    forecasting pipeline must beat: naive (yesterday's value) vs
    seasonal-naive (same weekday last week), scored on the daily
    count series by total absolute error and fixed-point MAPE
    (per-day percentage errors floored BEFORE averaging, so the
    aggregate is order-independent). The winner column is the
    week-seasonality verdict that events_autocorrelation_lag7
    suggests and this measures out of sample.

    Scale: the bounded calendar-series shape — events reduce to
    |days| rows map-side, two LAGs, one summary row."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "c",
        F.lag("c", 1).over(w).alias("f_naive"),
        F.lag("c", 7).over(w).alias("f_seasonal"),
    ).filter(F.col("f_seasonal").isNotNull())
    e_n = F.abs(F.col("c") - F.col("f_naive"))
    e_s = F.abs(F.col("c") - F.col("f_seasonal"))
    scored = lagged.select(
        e_n.alias("e_n"),
        e_s.alias("e_s"),
        F.floor(10000.0 * e_n / F.col("c")).cast("long").alias("pe_n4"),
        F.floor(10000.0 * e_s / F.col("c")).cast("long").alias("pe_s4"),
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("e_n").cast("long").alias("sae_naive"),
        F.sum("e_s").cast("long").alias("sae_seasonal"),
        F.floor(F.sum("pe_n4").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mape_naive4"),
        F.floor(F.sum("pe_s4").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mape_seasonal4"),
        F.when(F.sum("e_s") < F.sum("e_n"), "seasonal")
        .otherwise("naive")
        .alias("winner"),
    )


@register(
    "lineitem_discount_response",
    oracle="""
        WITH fx AS (
            SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct,
                   CAST(l_quantity AS BIGINT) AS q,
                   CAST(floor(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT) AS net4
            FROM lineitem
        )
        SELECT disc_pct,
               CAST(count(*) AS BIGINT) AS n,
               CAST(floor(CAST(sum(q) AS DOUBLE) * 10000 / count(*)) AS BIGINT)
                   AS avg_qty4,
               CAST(sum(net4) AS BIGINT) AS net_revenue4
        FROM fx GROUP BY disc_pct ORDER BY disc_pct
    """,
    tags=("relational", "aggregate", "pricing"),
)
def lineitem_discount_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount response curve: per discount percentage point, the
    line count, average quantity (does discounting move volume?) and
    exact net revenue — the margin-vs-volume table a pricing review
    reads before changing the discount ladder (the demand-side
    companion to the Laspeyres price index). The discount bucket is
    floor(d·100 + 0.5) — the +0.5 absorbs the float representation of
    values like 0.07 (stored as 0.06999…) identically in both
    engines.

    Scale: one map-side-combining aggregate to ≤ 11 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    fx = li.select(
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("disc_pct"),
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
        )
        .cast("long")
        .alias("net4"),
    )
    return (
        fx.groupBy("disc_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.floor(F.sum("q").cast("double") * 10000 / F.count(F.lit(1)))
            .cast("long")
            .alias("avg_qty4"),
            F.sum("net4").cast("long").alias("net_revenue4"),
        )
        .orderBy("disc_pct")
    )


@register(
    "pipeline_intake_scorecard",
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
        per_doc AS (
            SELECT w.doc_id, len(w.w) AS n_tokens,
                   coalesce(c.n_cov, 0) AS n_removed
            FROM words w LEFT JOIN (
                SELECT doc_id, count(*) AS n_cov FROM covered GROUP BY doc_id
            ) c ON c.doc_id = w.doc_id
        ),
        pwords AS (
            SELECT source, {SQL_TOKENS} AS w
            FROM documents
        ),
        fps AS (
            SELECT DISTINCT md5(array_to_string(w[1:8], ' ')) AS h, source
            FROM pwords
        ),
        xsrc AS (
            SELECT a.source, count(*) AS n_shared
            FROM fps a JOIN fps b ON a.h = b.h AND a.source <> b.source
            GROUP BY a.source
        ),
        agg AS (
            SELECT d.source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(p.n_tokens) AS BIGINT) AS tot_tokens,
                   CAST(floor(CAST(sum(p.n_removed) AS DOUBLE) * 10000
                              / sum(p.n_tokens)) AS BIGINT) AS span_dup_pct4,
                   CAST(coalesce(max(x.n_shared), 0) AS BIGINT)
                       AS cross_src_fps
            FROM per_doc p
            JOIN documents d ON d.doc_id = p.doc_id
            LEFT JOIN xsrc x ON x.source = d.source
            GROUP BY d.source
        )
        SELECT source, n_docs, tot_tokens, span_dup_pct4, cross_src_fps,
               CASE WHEN span_dup_pct4 > 1000 OR cross_src_fps > n_docs / 2
                    THEN 'review' ELSE 'healthy' END AS verdict
        FROM agg ORDER BY source
    """,
    tags=("llm-data", "pipeline", "reporting", "capstone"),
)
def pipeline_intake_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 capstone: the per-source intake scorecard an ingestion
    review reads — document counts, token volume, span-duplication
    rate (the dedup_span_excise machinery), cross-source prefix-
    fingerprint pressure (the dedup_cross_source_matrix signal,
    rolled to a per-source count), and a verdict: a source over 10%
    duplicated tokens or sharing fingerprints with other feeds on
    more than half its documents gets 'review' before any excision
    runs (thresholds as integer cross-multiplications).

    Scale: composes the two underlying pipelines' plans (linear
    shingle stats; bounded fingerprint self-join) plus |sources|-row
    aggregation — nothing new shuffles at document scale."""
    d = load_table(spark, sf_dir, "documents")
    per = dedup_span_excise(spark, sf_dir).select(
        "doc_id", "n_tokens", "n_removed"
    )
    fps = d.select(
        F.md5(F.concat_ws(" ", F.slice(tokens("text"), 1, 8))).alias("h"),
        "source",
    ).distinct()
    b = fps.select(F.col("h").alias("hb"), F.col("source").alias("sb"))
    xsrc = (
        fps.join(b, (F.col("h") == F.col("hb")) & (F.col("source") != F.col("sb")))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    agg = (
        per.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tot_tokens"),
            F.floor(
                F.sum("n_removed").cast("double") * 10000 / F.sum("n_tokens")
            )
            .cast("long")
            .alias("span_dup_pct4"),
        )
        .join(xsrc, "source", "left")
        .withColumn(
            "cross_src_fps",
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long"),
        )
    )
    return agg.select(
        "source",
        "n_docs",
        "tot_tokens",
        "span_dup_pct4",
        "cross_src_fps",
        F.when(
            (F.col("span_dup_pct4") > 1000)
            | (F.col("cross_src_fps") > F.expr("n_docs div 2")),
            "review",
        )
        .otherwise("healthy")
        .alias("verdict"),
    ).orderBy("source")
