"""Round-4 batches 180+: data-profiling / schema-discovery family —
functional-dependency audits, inclusion-dependency (foreign-key
orphan) audits, and candidate-key uniqueness audits, plus the
operational capstones built on them.

This is the Metanome-style profiling surface a lakehouse team runs
before trusting a 100 TB ingest: which column→column dependencies
actually hold, which declared FK edges have orphans, which "keys" are
really unique. The reference engine has no relational surface at all
(its operators are the keyed arithmetic stages,
Streamer.java:443-466); these extend the SURVEY §2-C inventory.

Determinism discipline as everywhere else: every compared column is
an exact BIGINT count or a fixed-point integer ratio ((10^4·a) div b
on non-negative integers, where floor == truncate in both engines);
no doubles, no libm.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table

# --- batch 180: functional-dependency audit --------------------------------

# Candidate FDs (table, name, det SQL expr / Spark col builder, dep col).
# Chosen to span the spectrum: trivially-held key FDs, plausibly-held
# low-cardinality FDs, and genuinely violated ones — the audit's value
# is the measured g3 rate, not the pass/fail bit.
_FD_ORDERS = [
    ("orders.o_orderkey->o_orderstatus", "CAST(o_orderkey AS VARCHAR)", "o_orderstatus"),
    ("orders.o_custkey->o_orderpriority", "CAST(o_custkey AS VARCHAR)", "o_orderpriority"),
    ("orders.o_orderdate->o_orderstatus", "strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')", "o_orderstatus"),
]
_FD_LINEITEM = [
    ("lineitem.l_partkey->l_returnflag", "CAST(l_partkey AS VARCHAR)", "l_returnflag"),
    ("lineitem.l_returnflag->l_linestatus", "l_returnflag", "l_linestatus"),
]


def _fd_stack_sql() -> str:
    parts = [
        f"SELECT '{name}' AS fd, {det} AS det, {dep} AS dep FROM orders"
        for name, det, dep in _FD_ORDERS
    ] + [
        f"SELECT '{name}' AS fd, {det} AS det, {dep} AS dep FROM lineitem"
        for name, det, dep in _FD_LINEITEM
    ]
    return " UNION ALL ".join(parts)


@register(
    "profile_fd_violations",
    oracle=f"""
        WITH stacked AS ({_fd_stack_sql()}),
        pair AS (
            SELECT fd, det, dep, CAST(count(*) AS BIGINT) AS c
            FROM stacked GROUP BY fd, det, dep
        ),
        keep AS (
            SELECT fd, det, CAST(max(c) AS BIGINT) AS kept,
                   CAST(sum(c) AS BIGINT) AS tot
            FROM pair GROUP BY fd, det
        )
        SELECT fd,
               CAST(sum(tot) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_det_groups,
               CAST(sum(tot) - sum(kept) AS BIGINT) AS violations,
               CAST((10000 * sum(kept)) // sum(tot) AS BIGINT) AS conformance_fp4,
               CAST(CASE WHEN sum(tot) = sum(kept) THEN 1 ELSE 0 END
                    AS BIGINT) AS holds
        FROM keep GROUP BY fd ORDER BY fd
    """,
    tags=("profiling", "fd-discovery", "data-quality"),
)
def profile_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency audit (Metanome-style): for
    each candidate FD det→dep, the g3 violation count — the minimum
    number of rows to delete for the FD to hold exactly, i.e.
    n − Σ_det max_dep count(det, dep) — plus the conformance rate.
    Candidates span held key FDs (o_orderkey→o_orderstatus), genuinely
    violated ones (o_custkey→o_orderpriority), and a calendar-grained
    determinant (order DATE→status). The measured rate is the
    deliverable: it tells a schema designer which dependencies are
    safe to normalize on and which "obvious" ones the data refutes.

    Scale shape: one map-side explode stacks all candidates in a
    single pass per table (no per-FD rescans), then two
    counts-only map-side-combining aggregates — the shuffled payload
    is (fd, det, dep, count) pairs, never rows. No windows, no joins.
    Adding a candidate FD is O(+1 array element)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def stack(df: DataFrame, fds, det_cols) -> DataFrame:
        structs = [
            F.struct(
                F.lit(name).alias("fd"),
                det.alias("det"),
                F.col(dep).alias("dep"),
            )
            for (name, _sql, dep), det in zip(fds, det_cols)
        ]
        return df.select(F.explode(F.array(*structs)).alias("s")).select("s.*")

    stacked = stack(
        o,
        _FD_ORDERS,
        [
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        ],
    ).unionAll(
        stack(
            li,
            _FD_LINEITEM,
            [F.col("l_partkey").cast("string"), F.col("l_returnflag")],
        )
    )
    pair = stacked.groupBy("fd", "det", "dep").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    keep = pair.groupBy("fd", "det").agg(
        F.max("c").cast("long").alias("kept"),
        F.sum("c").cast("long").alias("tot"),
    )
    return (
        keep.groupBy("fd")
        .agg(
            F.sum("tot").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_det_groups"),
            (F.sum("tot") - F.sum("kept")).cast("long").alias("violations"),
            F.expr("(10000 * sum(kept)) div sum(tot)").alias(
                "conformance_fp4"
            ),
            F.when(F.sum("tot") == F.sum("kept"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("holds"),
        )
        .orderBy("fd")
    )


# --- batch 180: inclusion-dependency (FK orphan) audit ---------------------

# (name, child table, child col, parent table, parent col). The last
# edge is the deliberately reversed one — orders with no lineitems
# exist in the fixture, so the audit must SHOW a violated IND, not
# just rubber-stamp the star schema.
_IND_PAIRS = [
    ("lineitem.l_orderkey<=orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey<=part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey<=supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey<=customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey<=nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey<=nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey<=region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.o_orderkey<=lineitem.l_orderkey", "orders", "o_orderkey", "lineitem", "l_orderkey"),
]


def _ind_pair_sql(name, ctab, ccol, ptab, pcol) -> str:
    return f"""
        SELECT '{name}' AS ind,
               CAST(sum(c.cnt) AS BIGINT) AS child_rows,
               CAST(count(*) AS BIGINT) AS child_distinct,
               CAST(count(CASE WHEN p.v IS NULL THEN 1 END) AS BIGINT)
                   AS orphan_distinct,
               CAST(coalesce(sum(CASE WHEN p.v IS NULL THEN c.cnt END), 0)
                    AS BIGINT) AS orphan_rows
        FROM (SELECT {ccol} AS v, count(*) AS cnt FROM {ctab}
              WHERE {ccol} IS NOT NULL GROUP BY {ccol}) c
        LEFT JOIN (SELECT DISTINCT {pcol} AS v FROM {ptab}) p USING (v)
    """


@register(
    "profile_inclusion_deps",
    oracle=f"""
        WITH per_pair AS ({" UNION ALL ".join(
            _ind_pair_sql(*p) for p in _IND_PAIRS)})
        SELECT ind, child_rows, child_distinct, orphan_distinct,
               orphan_rows,
               (10000 * (child_rows - orphan_rows)) // child_rows
                   AS coverage_fp4,
               CAST(CASE WHEN orphan_distinct = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS holds
        FROM per_pair ORDER BY ind
    """,
    tags=("profiling", "inclusion-dependency", "referential-integrity"),
)
def profile_inclusion_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency / foreign-key orphan audit over the full
    declared star schema, one row per FK edge: distinct child values,
    how many of them have no parent (orphan_distinct), how many child
    ROWS dangle (orphan_rows), and the row-coverage rate. The edge
    set includes the deliberately reversed
    orders.o_orderkey ⊆ lineitem.l_orderkey, which the fixture
    violates (orders with no lineitems) — the audit demonstrably
    reports failures, it doesn't just confirm the schema.

    Scale shape: each child side collapses to (value, count) by a
    map-side-combining aggregate BEFORE any join, so the per-edge
    join is distinct-values vs distinct-values — AQE broadcasts the
    dim-sized parents and sort-merges the fact-sized ones on the same
    key partitioning the aggregate just produced. The eight edges are
    independent DAG branches that run concurrently; output is 8 rows."""
    tabs = {
        t: load_table(spark, sf_dir, t)
        for t in {p[1] for p in _IND_PAIRS} | {p[3] for p in _IND_PAIRS}
    }

    def one(name, ctab, ccol, ptab, pcol) -> DataFrame:
        child = (
            tabs[ctab]
            .filter(F.col(ccol).isNotNull())
            .groupBy(F.col(ccol).alias("v"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        parent = tabs[ptab].select(F.col(pcol).alias("v")).distinct()
        j = child.join(
            parent.withColumn("_hit", F.lit(1)), "v", "left"
        )
        return j.agg(
            F.lit(name).alias("ind"),
            F.sum("cnt").cast("long").alias("child_rows"),
            F.count(F.lit(1)).cast("long").alias("child_distinct"),
            F.count(F.when(F.col("_hit").isNull(), 1))
            .cast("long")
            .alias("orphan_distinct"),
            F.coalesce(
                F.sum(F.when(F.col("_hit").isNull(), F.col("cnt"))),
                F.lit(0),
            )
            .cast("long")
            .alias("orphan_rows"),
        )

    per_pair = reduce(
        DataFrame.unionAll, (one(*p) for p in _IND_PAIRS)
    )
    return per_pair.select(
        "ind",
        "child_rows",
        "child_distinct",
        "orphan_distinct",
        "orphan_rows",
        F.expr(
            "(10000 * (child_rows - orphan_rows)) div child_rows"
        ).alias("coverage_fp4"),
        F.when(F.col("orphan_distinct") == 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("holds"),
    ).orderBy("ind")


# --- batch 180: candidate-key uniqueness audit -----------------------------

_KEY_CANDIDATES = [
    ("lineitem", ["l_orderkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("lineitem", ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]),
    ("orders", ["o_orderkey"]),
    ("part", ["p_partkey"]),
    ("events", ["event_id"]),
    ("documents", ["doc_id"]),
]


def _key_sql(tab: str, cols: list[str]) -> str:
    name = f"{tab}({','.join(cols)})"
    return f"""
        SELECT '{name}' AS key_name,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(c) - count(*) AS BIGINT) AS dup_rows,
               CAST(max(c) AS BIGINT) AS max_group_rows,
               CAST(CASE WHEN sum(c) = count(*) THEN 1 ELSE 0 END
                    AS BIGINT) AS is_key
        FROM (SELECT count(*) AS c FROM {tab}
              GROUP BY {", ".join(cols)})
    """


@register(
    "profile_key_candidates",
    oracle=f"""
        {" UNION ALL ".join(_key_sql(t, c) for t, c in _KEY_CANDIDATES)}
        ORDER BY key_name
    """,
    tags=("profiling", "key-discovery", "data-quality"),
)
def profile_key_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key uniqueness audit: for each declared or suspected
    key combination, the exact duplicate-row count and the largest
    duplicate group. The candidate list bakes in the fixture's known
    trap — (l_orderkey, l_linenumber) is NOT unique in the synthetic
    lineitem (canaried in tests/test_fixture_schema.py) — so the
    audit's output proves it measures rather than assumes: that row
    reports is_key = 0 with the real duplicate count, while the
    single-column table ids all report is_key = 1.

    Scale shape: one counts-only groupBy per candidate (map-side
    combine shrinks each to its distinct-key cardinality before the
    shuffle), then a single-row aggregate per candidate; the
    candidates are independent DAG branches. Nothing is ever sorted;
    no window, no join. This is exactly how a uniqueness validation
    runs over a 100 TB fact table."""
    out = []
    for tab, cols in _KEY_CANDIDATES:
        name = f"{tab}({','.join(cols)})"
        g = (
            load_table(spark, sf_dir, tab)
            .groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        out.append(
            g.agg(
                F.lit(name).alias("key_name"),
                F.sum("c").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                (F.sum("c") - F.count(F.lit(1)))
                .cast("long")
                .alias("dup_rows"),
                F.max("c").cast("long").alias("max_group_rows"),
                F.when(F.sum("c") == F.count(F.lit(1)), F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("is_key"),
            )
        )
    return reduce(DataFrame.unionAll, out).orderBy("key_name")


# --- batch 181: compaction planning (next-fit bin packing) -----------------

_COMPACT_TARGET = 2048  # target bin size in chars (fixture-scaled)


@register(
    "layout_compaction_nextfit",
    oracle=f"""
        WITH f AS (
            SELECT source, doc_id, n_chars AS sz,
                   SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM documents
        ),
        binned AS (
            SELECT source, doc_id, sz,
                   (cum - sz) // {_COMPACT_TARGET} AS bin
            FROM f
        ),
        bins AS (
            SELECT source, bin,
                   CAST(count(*) AS BIGINT) AS n_files,
                   CAST(sum(sz) AS BIGINT) AS bytes
            FROM binned GROUP BY source, bin
        )
        SELECT source,
               CAST(sum(n_files) AS BIGINT) AS n_files,
               CAST(sum(bytes) AS BIGINT) AS total_bytes,
               CAST(count(*) AS BIGINT) AS n_bins,
               CAST(sum(bytes) AS BIGINT) // count(*) AS avg_bin_bytes,
               CAST(max(bytes) AS BIGINT) AS max_bin_bytes,
               CAST(min(bytes) AS BIGINT) AS min_bin_bytes,
               CAST(count_if(bytes > {_COMPACT_TARGET}) AS BIGINT)
                   AS overflow_bins
        FROM bins GROUP BY source ORDER BY source
    """,
    tags=("layout", "compaction", "lakehouse-ops"),
)
def layout_compaction_nextfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning: treat each document as an
    ingested file (size = n_chars) and assign files to compaction
    bins per source with deterministic next-fit-by-offset packing —
    a file lands in bin ⌊start_offset / target⌋, where start_offset
    is the exact running sum of sizes in doc_id order. Each bin then
    holds ≥ target bytes except the trailing one (a file straddling a
    boundary stays in the bin where it started — overflow-carry,
    reported as ``overflow_bins``). This is the planning step a
    lakehouse table service runs before rewriting a 100 TB table's
    small files into target-sized parquet.

    The exact per-source running sum is computed scalably with the
    same two-phase shape as sample_pps_systematic: doc_id range
    buckets (order-preserving) get within-bucket running sums under a
    PARTITIONED window, bucket start offsets come from a window over
    the tiny per-(source, bucket) totals table — no full-source
    single-partition sort even when one source dominates the corpus.
    Output is one summary row per source (fill statistics, overflow
    count); the per-bin assignment stays distributed and is never
    collected."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.col("n_chars").alias("sz"),
        (F.col("doc_id") / 1024).cast("long").alias("b"),
    )
    win_in = (
        Window.partitionBy("source", "b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("cum_in", F.sum("sz").over(win_in))
    totals = d.groupBy("source", "b").agg(F.sum("sz").alias("bt"))
    win_b = (
        Window.partitionBy("source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "source", "b", (F.sum("bt").over(win_b) - F.col("bt")).alias("off")
    )
    binned = (
        d.join(offsets, ["source", "b"])
        .select(
            "source",
            "sz",
            F.expr(f"(off + cum_in - sz) div {_COMPACT_TARGET}").alias("bin"),
        )
    )
    bins = binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("sz").cast("long").alias("bytes"),
    )
    return (
        bins.groupBy("source")
        .agg(
            F.sum("n_files").cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("total_bytes"),
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.expr("sum(bytes) div count(*)").alias("avg_bin_bytes"),
            F.max("bytes").cast("long").alias("max_bin_bytes"),
            F.min("bytes").cast("long").alias("min_bin_bytes"),
            F.count_if(F.col("bytes") > _COMPACT_TARGET)
            .cast("long")
            .alias("overflow_bins"),
        )
        .orderBy("source")
    )


# --- batch 182: Little's law conservation audit ----------------------------

_SESSION_GAP_S = 1800  # same 30-min convention as events_sessionization


@register(
    "events_littles_law_audit",
    oracle=f"""
        WITH e AS (
            SELECT DISTINCT user_id, epoch_us(ts) // 1000000 AS s
            FROM events
        ),
        g AS (
            SELECT user_id, s,
                   CASE WHEN lag(s) OVER (PARTITION BY user_id ORDER BY s)
                             IS NULL
                          OR s - lag(s) OVER (PARTITION BY user_id
                                              ORDER BY s) > {_SESSION_GAP_S}
                        THEN 1 ELSE 0 END AS brk
            FROM e
        ),
        sid AS (
            SELECT user_id, s,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sess
            FROM g
        ),
        sess AS (
            SELECT user_id, sess,
                   CAST(min(s) AS BIGINT) AS s0,
                   CAST(max(s) AS BIGINT) AS s1
            FROM sid GROUP BY user_id, sess
        ),
        horizon AS (
            SELECT CAST(min(s) AS BIGINT) AS h0,
                   CAST(max(s) AS BIGINT) AS h1
            FROM e
        ),
        direct AS (
            SELECT CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(sum(s1 - s0) AS BIGINT) AS busy_s
            FROM sess
        ),
        per_day AS (
            SELECT CAST(coalesce(sum(
                       least(s1, (d.k + 1) * 86400)
                       - greatest(s0, d.k * 86400)), 0) AS BIGINT)
                       AS busy_s_by_day
            FROM sess,
                 LATERAL (SELECT unnest(generate_series(
                     s0 // 86400, s1 // 86400)) AS k) d
        )
        SELECT n_sessions, busy_s, busy_s_by_day,
               CAST(CASE WHEN busy_s = busy_s_by_day THEN 1 ELSE 0 END
                    AS BIGINT) AS identity_ok,
               CAST(h1 - h0 AS BIGINT) AS horizon_s,
               (100000000 * busy_s) // (h1 - h0) AS l_avg_fp8,
               (10000 * n_sessions * 86400) // (h1 - h0)
                   AS lambda_per_day_fp4,
               (10000 * busy_s) // n_sessions AS w_avg_s_fp4
        FROM direct CROSS JOIN per_day CROSS JOIN horizon
    """,
    tags=("events", "queueing", "conservation-audit"),
)
def events_littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit (L = λ·W) over sessionized events: sessions
    are 30-min-gap islands per user (the events_sessionization
    convention), the busy integral ∫ concurrency dt equals the sum of
    session durations EXACTLY, and the audit proves it by computing
    that quantity two independent ways — directly per session, and by
    splitting every session across the UTC days it spans and summing
    the per-day overlaps. ``identity_ok`` certifies conservation; the
    time-averaged concurrency L, arrival rate λ, and mean residence
    W are then exact integer ratios of the certified sums. This is
    the capacity-planning identity an SRE checks before trusting any
    concurrency dashboard — and the aggregate cross-check of
    events_peak_concurrency's sweep line.

    All arithmetic is whole epoch-seconds (``epoch_us div 1e6``) —
    no date→epoch conversion that could drag a timezone in. Duplicate
    (user, second) pairs are collapsed first so the gaps-and-islands
    window has a total order.

    Scale shape: the per-user lag/running-sum windows partition on
    user_id (bounded per-user series, the sessionization precedent);
    sessions then collapse to one row each; the day-split explode
    fans a session to its spanned days (bounded by the calendar) and
    feeds a counts-only aggregate. Output is a single audit row."""
    ev = load_table(spark, sf_dir, "events")
    from kafkastreamer_spark.queries._util import epoch_s

    e = ev.select("user_id", epoch_s(F.col("ts")).alias("s")).distinct()
    wl = Window.partitionBy("user_id").orderBy("s")
    g = e.withColumn(
        "brk",
        F.when(
            F.lag("s").over(wl).isNull()
            | (F.col("s") - F.lag("s").over(wl) > _SESSION_GAP_S),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sid = g.withColumn(
        "sess",
        F.sum("brk").over(
            wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sess = sid.groupBy("user_id", "sess").agg(
        F.min("s").cast("long").alias("s0"),
        F.max("s").cast("long").alias("s1"),
    )
    horizon = e.agg(
        F.min("s").cast("long").alias("h0"),
        F.max("s").cast("long").alias("h1"),
    )
    direct = sess.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.col("s1") - F.col("s0")).cast("long").alias("busy_s"),
    )
    per_day = (
        sess.select(
            "s0",
            "s1",
            F.explode(
                F.sequence(
                    F.expr("s0 div 86400"), F.expr("s1 div 86400")
                )
            ).alias("k"),
        )
        .select(
            (
                F.least(F.col("s1"), (F.col("k") + 1) * 86400)
                - F.greatest(F.col("s0"), F.col("k") * 86400)
            ).alias("ov")
        )
        .agg(
            F.coalesce(F.sum("ov"), F.lit(0))
            .cast("long")
            .alias("busy_s_by_day")
        )
    )
    return (
        direct.crossJoin(F.broadcast(per_day))
        .crossJoin(F.broadcast(horizon))
        .select(
            "n_sessions",
            "busy_s",
            "busy_s_by_day",
            F.when(F.col("busy_s") == F.col("busy_s_by_day"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("identity_ok"),
            (F.col("h1") - F.col("h0")).cast("long").alias("horizon_s"),
            F.expr("(100000000 * busy_s) div (h1 - h0)").alias(
                "l_avg_fp8"
            ),
            F.expr(
                "(10000 * n_sessions * 86400) div (h1 - h0)"
            ).alias("lambda_per_day_fp4"),
            F.expr("(10000 * busy_s) div n_sessions").alias(
                "w_avg_s_fp4"
            ),
        )
    )


# --- batch 183: NDCG@k ranking-quality metric ------------------------------

_NDCG_K = 10
# Exact fixed-point discount table floor(1e8 / log2(rank+1)), computed
# ONCE here in Python and embedded as the same literal CASE expression
# in both engines — the only log2 in the operator happens at module
# import, never inside either query engine, so the compared columns
# stay transcendental-free.
_DISC_FP8 = {
    i: int(__import__("math").floor(1e8 / __import__("math").log2(i + 1)))
    for i in range(1, _NDCG_K + 1)
}


def _disc_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {i} THEN {d}" for i, d in _DISC_FP8.items()
    )
    return f"CASE {col} {whens} ELSE 0 END"


@register(
    "ml_ndcg_at_k",
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
                       AS actual_rank
            FROM rev
        ),
        scored AS (
            SELECT nation,
                   greatest(0, 5 - actual_rank) AS rel,
                   pred_rank, actual_rank
            FROM ranked
        )
        SELECT nation,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(CASE WHEN pred_rank <= {_NDCG_K}
                    THEN rel * ({_disc_case("pred_rank")}) ELSE 0 END)
                    AS BIGINT) AS dcg_fp8,
               CAST(sum(CASE WHEN actual_rank <= {_NDCG_K}
                    THEN rel * ({_disc_case("actual_rank")}) ELSE 0 END)
                    AS BIGINT) AS idcg_fp8,
               CAST((10000 * sum(CASE WHEN pred_rank <= {_NDCG_K}
                    THEN rel * ({_disc_case("pred_rank")}) ELSE 0 END))
                   // sum(CASE WHEN actual_rank <= {_NDCG_K}
                    THEN rel * ({_disc_case("actual_rank")}) ELSE 0 END)
                   AS BIGINT) AS ndcg_fp4
        FROM scored GROUP BY nation ORDER BY nation
    """,
    tags=("ml-metrics", "ranking", "ndcg"),
)
def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of a historical ranking policy: rank each nation's
    suppliers by 1995 revenue (the "prediction") and score that
    ordering against graded relevance derived from realized 1996
    revenue (top-1996 supplier rel=4 down to rel=1 for rank 4, 0
    beyond). DCG uses the standard 1/log2(rank+1) discount as an
    exact fixed-point table computed once at module import and
    embedded identically in both engines; NDCG normalizes by the
    ideal ordering's DCG, so every compared column is an exact
    BIGINT. The companion of ml_click_purchase_auc (binary
    classification) for the RANKING side of offline model evaluation.

    Scale shape: one conditional-aggregate pass over the fact join
    produces per-(nation, supplier) year revenues; the two
    row_number windows partition on nation with per-nation group
    sizes bounded by the supplier dim; discounts apply via a literal
    CASE (no join); final rollup is counts-only. At 100 TB the only
    fact-sized shuffle is the first aggregate's."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    from kafkastreamer_spark.queries._util import fixed

    li_y = li.withColumn("yr", F.year(F.to_date("l_shipdate"))).filter(
        F.col("yr").isin(1995, 1996)
    )
    rev_fp = fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    base = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(li_y, li_y.l_suppkey == s.s_suppkey, "left")
        .groupBy(F.col("n_name").alias("nation"), "s_suppkey")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("yr") == 1995, rev_fp)), F.lit(0)
            )
            .cast("long")
            .alias("rev95_fp4"),
            F.coalesce(
                F.sum(F.when(F.col("yr") == 1996, rev_fp)), F.lit(0)
            )
            .cast("long")
            .alias("rev96_fp4"),
        )
    )
    wp = Window.partitionBy("nation").orderBy(
        F.desc("rev95_fp4"), "s_suppkey"
    )
    wa = Window.partitionBy("nation").orderBy(
        F.desc("rev96_fp4"), "s_suppkey"
    )
    ranked = base.select(
        "nation",
        F.row_number().over(wp).cast("long").alias("pred_rank"),
        F.row_number().over(wa).cast("long").alias("actual_rank"),
    ).withColumn("rel", F.greatest(F.lit(0), 5 - F.col("actual_rank")))
    dcg_term = F.when(
        F.col("pred_rank") <= _NDCG_K,
        F.col("rel") * F.expr(_disc_case("pred_rank")),
    ).otherwise(F.lit(0))
    idcg_term = F.when(
        F.col("actual_rank") <= _NDCG_K,
        F.col("rel") * F.expr(_disc_case("actual_rank")),
    ).otherwise(F.lit(0))
    return (
        ranked.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum(dcg_term).cast("long").alias("dcg_fp8"),
            F.sum(idcg_term).cast("long").alias("idcg_fp8"),
            F.expr(
                f"(10000 * sum(CASE WHEN pred_rank <= {_NDCG_K} "
                f"THEN rel * ({_disc_case('pred_rank')}) ELSE 0 END)) "
                f"div sum(CASE WHEN actual_rank <= {_NDCG_K} "
                f"THEN rel * ({_disc_case('actual_rank')}) ELSE 0 END)"
            ).alias("ndcg_fp4"),
        )
        .orderBy("nation")
    )


# --- batch 184: Croston intermittent-demand forecast -----------------------


@register(
    "lineitem_croston_forecast",
    oracle="""
        WITH pm AS (
            SELECT l_partkey,
                   year(CAST(l_shipdate AS DATE)) * 12
                       + month(CAST(l_shipdate AS DATE)) AS mi,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                       AS q
            FROM lineitem
            WHERE year(CAST(l_shipdate AS DATE)) BETWEEN 1995 AND 1997
            GROUP BY 1, 2
        ),
        nz AS (
            SELECT l_partkey, mi, q,
                   CAST(row_number() OVER (PARTITION BY l_partkey
                        ORDER BY mi) AS BIGINT) AS j,
                   CAST(coalesce(mi - lag(mi) OVER (PARTITION BY l_partkey
                        ORDER BY mi), 1) AS BIGINT) AS p
            FROM pm WHERE q > 0
        ),
        wtd AS (
            SELECT l_partkey, q, p, j,
                   CASE WHEN j = 1 THEN CAST(1 AS BIGINT)
                        ELSE (CAST(1 AS BIGINT) << (j - 2)) END AS w
            FROM nz
        ),
        acc AS (
            SELECT l_partkey,
                   CAST(count(*) AS BIGINT) AS n_nonzero,
                   CAST(sum(q * w) AS BIGINT) AS sz,
                   CAST(sum(p * w) AS BIGINT) AS sp,
                   CAST(sum(p) AS BIGINT) AS tot_p
            FROM wtd GROUP BY l_partkey
        )
        SELECT l_partkey, n_nonzero,
               (10000 * tot_p) // n_nonzero AS adi_fp4,
               (10000 * sz) // sp AS croston_fp4,
               (7500 * sz) // sp AS sba_fp4
        FROM acc ORDER BY l_partkey
    """,
    tags=("inventory", "forecast", "intermittent-demand"),
)
def lineitem_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand, exactly: per part,
    EWMA-smooth the nonzero monthly demand SIZES (z) and the
    INTERVALS between demand months (p) with α = 1/2, forecast
    z_ewma / p_ewma per month, plus the Syntetos–Boylan approximation
    (SBA = (1 − α/2)·z/p = 3/4 of Croston) — the forecaster the
    lineitem_demand_classification operator routes intermittent/lumpy
    SKUs to. The α = 1/2 dyadic trick from events_ewma_halflife makes
    both EWMAs exact BIGINT weighted sums (weight 2^(j-2), the
    2^(n-1) denominators CANCEL in the z/p ratio), so the forecast is
    a pure integer division — zero doubles anywhere in the operator,
    not even the final division. The first interval is initialized to
    1 (documented convention, identical in both engines).

    Overflow headroom: ≤ 36 monthly points per part in the 1995-97
    window ⇒ weights ≤ 2³⁴, monthly quantity ≤ ~10⁴ ⇒ Σ q·w < 2⁶³.
    A longer horizon re-anchors per ~36-month block with the running
    EWMA as seed — same plan shape.

    Scale shape: one fact-table aggregate to (part, month), then
    per-part windows over ≤ 36 rows, then a counts-only rollup —
    exactly one fact-sized shuffle; output one row per active part."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.year(F.to_date("l_shipdate")).between(1995, 1997)
    )
    pm = li.groupBy(
        "l_partkey",
        (
            F.year(F.to_date("l_shipdate")) * 12
            + F.month(F.to_date("l_shipdate"))
        ).alias("mi"),
    ).agg(
        F.sum(F.floor("l_quantity").cast("long")).cast("long").alias("q")
    )
    wl = Window.partitionBy("l_partkey").orderBy("mi")
    nz = (
        pm.filter(F.col("q") > 0)
        .withColumn("j", F.row_number().over(wl).cast("long"))
        .withColumn(
            "p",
            F.coalesce(
                F.col("mi") - F.lag("mi").over(wl), F.lit(1)
            ).cast("long"),
        )
    )
    wtd = nz.withColumn(
        "w",
        F.when(F.col("j") == 1, F.lit(1).cast("long")).otherwise(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j - 2 AS INT))")
        ),
    )
    acc = wtd.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_nonzero"),
        F.sum(F.col("q") * F.col("w")).cast("long").alias("sz"),
        F.sum(F.col("p") * F.col("w")).cast("long").alias("sp"),
        F.sum("p").cast("long").alias("tot_p"),
    )
    return acc.select(
        "l_partkey",
        "n_nonzero",
        F.expr("(10000 * tot_p) div n_nonzero").alias("adi_fp4"),
        F.expr("(10000 * sz) div sp").alias("croston_fp4"),
        F.expr("(7500 * sz) div sp").alias("sba_fp4"),
    ).orderBy("l_partkey")


# --- batch 215: cross-field business-rule conformance audit ----------------

# (rule name, table, violation predicate SQL). Rules mix held
# invariants (name digits encode the key) with genuinely violated
# ones (negative account balances exist in the fixture) so the audit
# demonstrably measures rather than rubber-stamps.
_RULES = [
    ("customer.name_encodes_key",
     "customer", "CAST(substr(c_name, 10) AS BIGINT) <> c_custkey"),
    ("supplier.name_encodes_key",
     "supplier", "CAST(substr(s_name, 10) AS BIGINT) <> s_suppkey"),
    ("customer.acctbal_nonnegative", "customer", "c_acctbal < 0"),
    ("supplier.acctbal_nonnegative", "supplier", "s_acctbal < 0"),
    ("part.size_in_1_50", "part", "p_size < 1 OR p_size > 50"),
    ("lineitem.discount_le_10pct",
     "lineitem", "l_discount < 0 OR l_discount > 0.1"),
]


def _rule_sql(name: str, table: str, viol: str) -> str:
    return f"""
        SELECT '{name}' AS rule,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count_if({viol}) AS BIGINT) AS violations
        FROM {table}
    """


@register(
    "profile_crossfield_rules",
    oracle=f"""
        WITH per_rule AS ({" UNION ALL ".join(
            _rule_sql(*r) for r in _RULES)})
        SELECT rule, n_rows, violations,
               (10000 * (n_rows - violations)) // n_rows
                   AS conformance_fp4,
               CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS holds
        FROM per_rule ORDER BY rule
    """,
    tags=("profiling", "data-quality", "rules"),
)
def profile_crossfield_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field business-rule conformance audit — the rule-based
    third leg of the profiling family (profile_fd_violations measures
    dependencies, profile_key_candidates uniqueness; this measures
    DECLARED invariants): per rule, exact violation counts and the
    conformance rate. The rule set mixes structural encodings that
    hold (entity names embed their keys — parsed and compared, not
    assumed) with range rules the fixture genuinely violates
    (negative account balances), so nonzero violation counts prove
    the audit measures. This is the Deequ/Great-Expectations check
    suite shape, evaluated engine-exactly.

    Scale shape: each rule is one conditional-count aggregate over
    its table — a map-side-combining counts-only pass, rules running
    as independent DAG branches; no joins, no windows, no shuffle
    beyond the 1-row-per-rule partials. Adding a rule is O(+1 array
    element) exactly like the FD audit."""
    tabs = {t: load_table(spark, sf_dir, t) for t in {r[1] for r in _RULES}}
    out = []
    for name, table, viol in _RULES:
        out.append(
            tabs[table].agg(
                F.lit(name).alias("rule"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.count_if(F.expr(viol)).cast("long").alias("violations"),
            )
        )
    per_rule = reduce(DataFrame.unionAll, out)
    return per_rule.select(
        "rule",
        "n_rows",
        "violations",
        F.expr("(10000 * (n_rows - violations)) div n_rows").alias(
            "conformance_fp4"
        ),
        F.when(F.col("violations") == 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("holds"),
    ).orderBy("rule")
