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

from pyspark.sql import DataFrame, SparkSession
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
               (10000 * sum(kept)) // sum(tot) AS conformance_fp4,
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
