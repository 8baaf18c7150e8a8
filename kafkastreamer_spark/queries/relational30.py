"""Round-10 batch 239: ops-analytics closure — gains table, shuffle-skew
diagnostics, sort-layout advisor, Markov-exit concentration, multimodal
aspect-ratio bucketing.

* ``ml_gains_table_deciles`` — the classic cumulative-gains/lift table
  by score decile: the campaign-targeting companion of
  ml_uplift_qini (which needs a treatment flag) and
  ml_pr_threshold_ladder (which walks thresholds, not population
  fractions).
* ``skew_key_diagnostics`` — per-key weight profile of a shuffle key
  (max share, percentile counts, recommended salt factor): the table
  you read BEFORE choosing join_skew_salted's salt count.
* ``layout_clustering_depth_advisor`` — for each candidate sort
  column, how many equal-row files a point predicate on that column
  would touch if the table were range-sorted by it — the 1-D
  sort-key advisor next to layout_zorder_audit's multi-column audit.
* ``events_transition_gini`` — Gini impurity of each event type's
  next-event distribution: concentration summary over
  events_markov_transitions' matrix (which states have deterministic
  exits vs diffuse ones).
* ``multimodal_aspect_bucket_packing`` — aspect-ratio bucketing for
  batched vision training (images batch only with same-shape images;
  the bucket map and its letterbox padding waste are the planning
  table), over the same md5-derived fake-decode dims as the decode
  stubs so the oracle reproduces them in SQL.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B analytics /
LLM-pipeline closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.queries.relational16 import _PER_USER_SQL, _per_user
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen


# ---------------------------------------------------------------------------
# ml_gains_table_deciles
# ---------------------------------------------------------------------------


@register(
    "ml_gains_table_deciles",
    oracle=f"""
        WITH per_user AS ({_PER_USER_SQL}),
        ranked AS (
            SELECT score, y,
                   row_number() OVER (ORDER BY score DESC, user_id) AS rn
            FROM per_user
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS pos
            FROM per_user
        ),
        dec AS (
            SELECT ((rn - 1) * 10) // (SELECT n FROM tot) + 1 AS decile,
                   CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(y) AS BIGINT) AS n_pos
            FROM ranked GROUP BY 1
        )
        SELECT decile, n_users, n_pos,
               CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos,
               CAST((sum(n_pos) OVER w * 10000) // t.pos AS BIGINT)
                   AS gain4,
               CAST((sum(n_pos) OVER w * t.n * 10000)
                    // (t.pos * sum(n_users) OVER w) AS BIGINT) AS lift4
        FROM dec CROSS JOIN tot t
        WINDOW w AS (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY decile
    """,
    tags=("ml", "metrics", "targeting"),
)
def ml_gains_table_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains and lift by score decile on the shared
    click-propensity cohort (relational16's per-user score/label):
    rank users by score (user_id tiebreak), split into 10 rank
    deciles, and report each decile's captured-positives share
    (gain) and lift over random targeting — the table behind every
    "top-2-decile campaign captures X% of converters" decision.
    Deciles are explicit rank buckets ``((rn-1)*10) div n + 1``, not
    ntile, so both engines bucket identically under ties.

    Scale shape: per-user partials aggregate map-side (the cohort is
    |users|, never raw events); the rank sort and the cumulative
    window run over that bounded cohort, and the decile rollup is 10
    rows before the window. One shuffle on user_id, one bounded sort.
    """
    pu = _per_user(spark, sf_dir)
    ranked = pu.select(
        "score",
        "y",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "user_id"))
        .alias("rn"),
    )
    tot = pu.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    dec = (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy(
            F.expr("((rn - 1) * 10) div n").alias("decile"),
            "n",
            "pos",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("y").cast("long").alias("n_pos"),
        )
        .withColumn("decile", F.col("decile") + 1)
    )
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        dec.withColumn("cum_pos", F.sum("n_pos").over(w).cast("long"))
        .withColumn("cum_n", F.sum("n_users").over(w).cast("long"))
        .select(
            "decile",
            "n_users",
            "n_pos",
            "cum_pos",
            F.expr("(cum_pos * 10000) div pos").cast("long").alias("gain4"),
            F.expr("(cum_pos * n * 10000) div (pos * cum_n)")
            .cast("long")
            .alias("lift4"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# skew_key_diagnostics
# ---------------------------------------------------------------------------

_SKEW_PARTITIONS = 32  # the planning parallelism the salt reco targets


@register(
    "skew_key_diagnostics",
    oracle=f"""
        WITH c AS (
            SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1
        ),
        r AS (
            SELECT key, c,
                   row_number() OVER (ORDER BY c, key) AS rn
            FROM c
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(sum(c) AS BIGINT) AS total_rows,
                   CAST(max(c) AS BIGINT) AS max_c
            FROM c
        )
        SELECT t.n_keys, t.total_rows, t.max_c,
               (SELECT min(key) FROM c WHERE c = t.max_c) AS top_key,
               CAST((t.max_c * 10000) // t.total_rows AS BIGINT)
                   AS max_share4,
               (SELECT c FROM r WHERE rn = (t.n_keys + 1) // 2) AS p50_c,
               (SELECT c FROM r
                WHERE rn = (t.n_keys * 99 + 99) // 100) AS p99_c,
               CAST(greatest(1, (t.max_c * {_SKEW_PARTITIONS}
                                 + t.total_rows - 1) // t.total_rows)
                    AS BIGINT) AS salt_reco
        FROM tot t
    """,
    tags=("skew", "diagnostics", "ops"),
)
def skew_key_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key weight profile for l_partkey: key count, heaviest
    key and its row share, p50/p99 per-key counts (exact
    rank-selected), and the salt factor that would level the heaviest
    key across {_SKEW_PARTITIONS} partitions
    (``ceil(max_c / (total/{_SKEW_PARTITIONS}))``) — the diagnostic
    read before reaching for join_skew_salted / skew_salted_agg, and
    at 100 TB the table that decides between AQE skew handling and
    explicit salting.

    Scale shape: one map-side-combining count per key; everything
    after runs on the |keys|-row profile (rank selection included) —
    raw rows are touched exactly once.
    """
    li = widen(load_table(spark, sf_dir, "lineitem"))
    c = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    r = c.select(
        "key", "c", F.row_number().over(Window.orderBy("c", "key")).alias("rn")
    )
    tot = c.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("total_rows"),
        F.max("c").cast("long").alias("max_c"),
    )
    top = (
        c.crossJoin(F.broadcast(tot.select(F.col("max_c").alias("m"))))
        .filter(F.col("c") == F.col("m"))
        .agg(F.min("key").cast("long").alias("top_key"))
    )
    p50 = (
        r.crossJoin(F.broadcast(tot.select("n_keys")))
        .filter(F.col("rn") == F.expr("(n_keys + 1) div 2"))
        .select(F.col("c").alias("p50_c"))
    )
    p99 = (
        r.crossJoin(F.broadcast(tot.select("n_keys")))
        .filter(F.col("rn") == F.expr("(n_keys * 99 + 99) div 100"))
        .select(F.col("c").alias("p99_c"))
    )
    return (
        tot.crossJoin(top)
        .crossJoin(p50)
        .crossJoin(p99)
        .select(
            "n_keys",
            "total_rows",
            "max_c",
            "top_key",
            F.expr("(max_c * 10000) div total_rows")
            .cast("long")
            .alias("max_share4"),
            "p50_c",
            "p99_c",
            F.expr(
                f"greatest(1, (max_c * {_SKEW_PARTITIONS} + total_rows - 1)"
                " div total_rows)"
            )
            .cast("long")
            .alias("salt_reco"),
        )
    )


# ---------------------------------------------------------------------------
# layout_clustering_depth_advisor
# ---------------------------------------------------------------------------

_LAYOUT_FILES = 32
_LAYOUT_CANDIDATES = ("l_orderkey", "l_partkey", "l_suppkey")


def _advisor_sql_one(col: str) -> str:
    return f"""
        SELECT '{col}' AS sort_col, key, c,
               sum(c) OVER (ORDER BY key
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) - c AS start
        FROM (SELECT {col} AS key, CAST(count(*) AS BIGINT) AS c
              FROM lineitem GROUP BY 1)
    """


@register(
    "layout_clustering_depth_advisor",
    oracle=f"""
        WITH per_key AS (
            {" UNION ALL ".join(_advisor_sql_one(c) for c in _LAYOUT_CANDIDATES)}
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS total
            FROM lineitem
        ),
        touched AS (
            SELECT sort_col, key, c,
                   ((start + c - 1) // ((total + {_LAYOUT_FILES - 1})
                                        // {_LAYOUT_FILES}))
                   - (start // ((total + {_LAYOUT_FILES - 1})
                                // {_LAYOUT_FILES})) + 1 AS files_touched
            FROM per_key CROSS JOIN tot
        )
        SELECT sort_col,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST((sum(files_touched) * 10000) // count(*) AS BIGINT)
                   AS avg_files_touched4,
               CAST(max(files_touched) AS BIGINT) AS max_files_touched
        FROM touched GROUP BY sort_col ORDER BY sort_col
    """,
    tags=("layout", "advisor", "ops"),
)
def layout_clustering_depth_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1-D sort-key advisor: if lineitem were range-sorted into
    {_LAYOUT_FILES} equal-row files by each candidate column, how many
    files would a point predicate on that column touch (per distinct
    value, exactly: from the value's row-offset range against the
    file-size grid)? The column with average touch count nearest 1
    gives the best min/max pruning for its predicates — the
    quantitative version of "sort by what you filter by", computed
    from the real value distribution rather than a rule of thumb.
    Complements layout_zorder_audit (multi-column interleave) and
    layout_stats_pruning_audit (existing layout's stats).

    Scale shape: per candidate, one map-side-combining count per key
    and one cumulative window over the |keys|-row profile (raw rows
    touched once per candidate); the three profiles union into one
    3-row report. At 100 TB this runs as one pass per candidate over
    the key histogram, never a sort of the fact table.
    """
    li = widen(load_table(spark, sf_dir, "lineitem"))
    total = li.agg(F.count(F.lit(1)).cast("long").alias("total"))
    parts = []
    for col in _LAYOUT_CANDIDATES:
        per_key = li.groupBy(F.col(col).alias("key")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        w = Window.orderBy("key").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        parts.append(
            per_key.withColumn("start", F.sum("c").over(w) - F.col("c"))
            .crossJoin(F.broadcast(total))
            .select(
                F.lit(col).alias("sort_col"),
                F.expr(
                    f"(start + c - 1) div ((total + {_LAYOUT_FILES - 1}) div {_LAYOUT_FILES})"
                ).alias("_hi"),
                F.expr(
                    f"start div ((total + {_LAYOUT_FILES - 1}) div {_LAYOUT_FILES})"
                ).alias("_lo"),
            )
            .select(
                "sort_col",
                (F.col("_hi") - F.col("_lo") + 1).alias("files_touched"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (
        allp.groupBy("sort_col")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.expr("(sum(files_touched) * 10000) div count(*)")
            .cast("long")
            .alias("avg_files_touched4"),
            F.max("files_touched").cast("long").alias("max_files_touched"),
        )
        .orderBy("sort_col")
    )


# ---------------------------------------------------------------------------
# events_transition_gini
# ---------------------------------------------------------------------------


@register(
    "events_transition_gini",
    oracle="""
        WITH seq AS (
            SELECT event_type AS from_t,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_t
            FROM events
        ),
        tr AS (
            SELECT from_t, to_t, CAST(count(*) AS BIGINT) AS c
            FROM seq WHERE to_t IS NOT NULL GROUP BY 1, 2
        ),
        per_from AS (
            SELECT from_t,
                   CAST(sum(c) AS BIGINT) AS n_out,
                   CAST(count(*) AS BIGINT) AS n_next_types,
                   CAST(sum(c * c) AS BIGINT) AS sum_c2
            FROM tr GROUP BY 1
        ),
        top AS (
            SELECT from_t, to_t,
                   row_number() OVER (
                       PARTITION BY from_t ORDER BY c DESC, to_t
                   ) AS rn
            FROM tr
        )
        SELECT p.from_t AS from_type, p.n_out, p.n_next_types,
               CAST(((p.n_out * p.n_out - p.sum_c2) * 10000)
                    // (p.n_out * p.n_out) AS BIGINT) AS gini4,
               t.to_t AS top_next
        FROM per_from p JOIN top t ON t.from_t = p.from_t AND t.rn = 1
        ORDER BY from_type
    """,
    tags=("events", "markov", "statistics"),
)
def events_transition_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity of each event type's next-event distribution
    (per-user sequences, (ts, event_id)-ordered): gini = 1 - sum
    p_i^2 in 1e-4 fixed point, with the modal next step alongside.
    Near-zero Gini marks states with deterministic exits (automation,
    redirects); high Gini marks genuine branch points — the
    one-row-per-state concentration summary over
    events_markov_transitions' full matrix, pure integer arithmetic
    so the oracle is exact.

    Scale shape: the lead() window shuffles once on user_id and sorts
    within user (the sessionization discipline); transitions collapse
    map-side to the |types|^2 matrix, and everything after runs on
    that bounded table.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    seq = ev.select(
        F.col("event_type").alias("from_t"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("to_t"),
    ).filter(F.col("to_t").isNotNull())
    tr = seq.groupBy("from_t", "to_t").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_from = tr.groupBy("from_t").agg(
        F.sum("c").cast("long").alias("n_out"),
        F.count(F.lit(1)).cast("long").alias("n_next_types"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
    )
    top = tr.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("from_t").orderBy(F.desc("c"), "to_t")
        ),
    ).filter(F.col("rn") == 1)
    return (
        per_from.join(top.select("from_t", "to_t"), "from_t")
        .select(
            F.col("from_t").alias("from_type"),
            "n_out",
            "n_next_types",
            F.expr("((n_out * n_out - sum_c2) * 10000) div (n_out * n_out)")
            .cast("long")
            .alias("gini4"),
            F.col("to_t").alias("top_next"),
        )
        .orderBy("from_type")
    )


# ---------------------------------------------------------------------------
# multimodal_aspect_bucket_packing
# ---------------------------------------------------------------------------

# canonical training aspect buckets, ratio*1e4 (1:2, 3:4, 1:1, 4:3, 2:1)
_ASPECT_BUCKETS = (5000, 7500, 10000, 13333, 20000)


@register(
    "multimodal_aspect_bucket_packing",
    oracle=f"""
        WITH dims AS (
            SELECT doc_id,
                   64 + CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT)
                       AS w,
                   64 + CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT)
                       AS h
            FROM documents
        ),
        ratio AS (
            SELECT doc_id, w, h, (w * 10000) // h AS ratio4 FROM dims
        ),
        cand AS (
            SELECT r.doc_id, r.w, r.h, r.ratio4, b.b4,
                   row_number() OVER (
                       PARTITION BY r.doc_id
                       ORDER BY abs(r.ratio4 - b.b4), b.b4
                   ) AS rn
            FROM ratio r CROSS JOIN
                 (SELECT unnest([{", ".join(str(b) for b in _ASPECT_BUCKETS)}])
                      AS b4) b
        )
        SELECT b4 AS bucket4,
               CAST(count(*) AS BIGINT) AS n_images,
               CAST(sum(w * h) AS BIGINT) AS sum_px,
               CAST(sum(abs(ratio4 - b4)) // count(*) AS BIGINT)
                   AS avg_dev4,
               CAST(sum(10000 - (least(ratio4, b4) * 10000)
                                // greatest(ratio4, b4)) // count(*)
                    AS BIGINT) AS avg_pad_waste4
        FROM cand WHERE rn = 1
        GROUP BY b4 ORDER BY bucket4
    """,
    tags=("llm-data", "multimodal", "packing"),
)
def multimodal_aspect_bucket_packing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Aspect-ratio bucketing for batched vision training: each
    decoded image joins the nearest canonical aspect bucket
    (1:2 / 3:4 / 1:1 / 4:3 / 2:1, ties to the narrower bucket), and
    the report prices each bucket — population, pixel volume, average
    ratio deviation, and the average letterbox padding fraction
    (1 - min(r,b)/max(r,b)) a fit-inside resize would waste. Batched
    image training requires same-shape batches; this table IS the
    bucketing plan and its padding cost. Dims come from the same
    md5-derived fake decode as multimodal_frame_sample
    (``_fake_decode``: no codecs in the container), which is what
    makes the oracle able to reproduce them in SQL.

    Scale shape: decode is an Arrow-batched mapInPandas map pass
    (embarrassingly parallel); bucket assignment is a 5-way broadcast
    argmin evaluated inline per row (no join, no shuffle); the rollup
    partial-aggregates to <= 5 rows.
    """
    from kafkastreamer_spark.operators.multimodal import (
        _blobs,
        _fake_decode,
    )

    import pandas as pd

    def _dims(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _n, _codec = _fake_decode(bytes(payload))
                rows.append((int(doc_id), w, h))
            yield pd.DataFrame(rows, columns=["doc_id", "w", "h"])

    dims = (
        _blobs(spark, sf_dir)
        .select("doc_id", "payload")
        .mapInPandas(_dims, schema="doc_id long, w long, h long")
    )
    ratio = dims.withColumn("ratio4", F.expr("(w * 10000) div h"))
    # inline argmin over the 5 buckets: sort (|dev|, b4) structs and
    # take the head — deterministic tie toward the narrower bucket
    bucket = F.expr(
        "array_sort(array("
        + ", ".join(
            f"named_struct('d', abs(ratio4 - {b}L), 'b', {b}L)"
            for b in _ASPECT_BUCKETS
        )
        + "))[0].b"
    )
    assigned = ratio.withColumn("bucket4", bucket)
    return (
        assigned.groupBy("bucket4")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum(F.col("w") * F.col("h")).cast("long").alias("sum_px"),
            F.expr("sum(abs(ratio4 - bucket4)) div count(*)")
            .cast("long")
            .alias("avg_dev4"),
            F.expr(
                "sum(10000 - (least(ratio4, bucket4) * 10000)"
                " div greatest(ratio4, bucket4)) div count(*)"
            )
            .cast("long")
            .alias("avg_pad_waste4"),
        )
        .orderBy("bucket4")
    )
