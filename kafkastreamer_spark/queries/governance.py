"""Data-governance and quota operators: rate limiting, k-anonymity
suppression, and delete-cascade (right-to-erasure) accounting.

The reference has no governance surface (append-only topics,
v1/src/main/java/Stream/Streamer.java:362-386); these are §2-B
closure rows that every production deployment of a corpus/event
pipeline eventually needs. All admission/suppression decisions are
integer comparisons on exact counts — engine-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

RATE_LIMIT = 10  # events admitted per (user, week)
K_ANON_PCT = 90  # suppress cells below this % of the mean cell size


@register(
    "events_rate_limit_quota",
    oracle=f"""
        WITH ranked AS (
            SELECT user_id, event_id,
                   date_trunc('week', ts) AS hr,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, date_trunc('week', ts)
                       ORDER BY ts, event_id) AS rn
            FROM events
        )
        SELECT user_id,
               count(*) AS total_events,
               CAST(sum(CASE WHEN rn <= {RATE_LIMIT} THEN 1 ELSE 0 END)
                    AS BIGINT) AS admitted,
               CAST(sum(CASE WHEN rn > {RATE_LIMIT} THEN 1 ELSE 0 END)
                    AS BIGINT) AS throttled
        FROM ranked
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("governance", "window", "quota"),
)
def events_rate_limit_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user weekly rate limiting: the first RATE_LIMIT events in
    each (user, week) are admitted in arrival order (ts, then event_id
    for a total order), the rest throttled — reported as per-user
    admitted/throttled totals. (Week granularity: the fixture's
    per-user-hour density is ~0.1, which makes any hourly quota
    vacuous; the plan is identical whatever the truncation.)

    Scale shape: one shuffle on (user_id, week) — the quota key — and
    the per-user rollup reuses the user_id prefix of that
    partitioning. The time truncation makes window state bounded and
    is exactly how the streaming form would key its
    applyInPandasWithState counter."""
    ev = widen(load_table(spark, sf_dir, "events"))
    hr = F.date_trunc("week", F.col("ts"))
    w = Window.partitionBy("user_id", hr.alias("hr")).orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.sum(F.when(F.col("rn") <= RATE_LIMIT, 1).otherwise(0))
            .cast("long")
            .alias("admitted"),
            F.sum(F.when(F.col("rn") > RATE_LIMIT, 1).otherwise(0))
            .cast("long")
            .alias("throttled"),
        )
        .orderBy("user_id")
    )


@register(
    "agg_k_anonymous_rollup",
    oracle=f"""
        WITH cells AS (
            SELECT n.n_name AS nation, c.c_mktsegment AS segment,
                   count(*) AS n_customers,
                   CAST(sum(CAST(floor(c.c_acctbal * 10000) AS BIGINT))
                        AS BIGINT) AS bal_fp
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT CAST(sum(n_customers) AS BIGINT) AS total,
                   count(*) AS n_cells
            FROM cells
        )
        SELECT CASE WHEN 100 * n_customers * n_cells >= {K_ANON_PCT} * total
                    THEN nation ELSE 'SUPPRESSED' END AS nation,
               CASE WHEN 100 * n_customers * n_cells >= {K_ANON_PCT} * total
                    THEN segment ELSE 'SUPPRESSED' END AS segment,
               CAST(sum(n_customers) AS BIGINT) AS n_customers,
               CAST(sum(bal_fp) AS DOUBLE) / 10000 AS total_acctbal
        FROM cells, tot
        GROUP BY 1, 2
        ORDER BY nation, segment
    """,
    tags=("governance", "aggregate", "privacy"),
)
def agg_k_anonymous_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-cell suppression for published aggregates: any
    (nation, segment) cell smaller than 90% of the mean cell size is
    folded into a single SUPPRESSED bucket instead of being released —
    the k-anonymity small-cell rule with the threshold expressed
    relative to the expected cell size (a fixed k is scale-degenerate
    on uniform fixtures: every cell fails it at sf0.01 and every cell
    passes at sf0.1; the relative rule suppresses the thin tail at
    any scale, same technique as q11's share-of-total HAVING).
    Decision is exact integer cross-multiplication
    (100·n·cells ≥ PCT·total) against a 1-row broadcast total.

    Two cheap aggregations: cell counts first (the test needs exact
    sizes), then the fold — both on dimension-cardinality data after
    the one customer-scale shuffle. Balances use the fixed-point
    discipline so the suppressed bucket's sum is engine-exact."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cells = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.floor(F.col("c_acctbal") * 10000).cast("long")).alias("bal_fp"),
        )
    )
    tot = cells.agg(
        F.sum("n_customers").cast("long").alias("total"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    cells = cells.crossJoin(F.broadcast(tot))
    ok = 100 * F.col("n_customers") * F.col("n_cells") >= K_ANON_PCT * F.col("total")
    return (
        cells.select(
            F.when(ok, F.col("nation")).otherwise("SUPPRESSED").alias("nation"),
            F.when(ok, F.col("segment")).otherwise("SUPPRESSED").alias("segment"),
            "n_customers",
            "bal_fp",
        )
        .groupBy("nation", "segment")
        .agg(
            F.sum("n_customers").cast("long").alias("n_customers"),
            (F.sum("bal_fp").cast("double") / 10000).alias("total_acctbal"),
        )
        .orderBy("nation", "segment")
    )


@register(
    "delete_cascade_accounting",
    oracle="""
        WITH tombstones AS (
            SELECT c_custkey FROM customer WHERE c_custkey % 37 = 0
        ),
        doomed_orders AS (
            SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM tombstones)
        )
        SELECT
            (SELECT count(*) FROM tombstones) AS customers_deleted,
            (SELECT count(*) FROM doomed_orders) AS orders_deleted,
            (SELECT count(*) FROM lineitem
             WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_orders))
                AS lineitems_deleted,
            (SELECT count(*) FROM orders) -
            (SELECT count(*) FROM doomed_orders) AS orders_surviving
    """,
    tags=("governance", "join", "maintenance"),
)
def delete_cascade_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade: a deterministic tombstone set
    (custkey % 37 = 0 stands in for deletion requests) propagates
    customer → orders → lineitem, reporting how many rows each level
    would delete plus the surviving order count. The real delete is
    the same plan with the counts replaced by anti-join writes
    (``merge_upsert_sink`` shape, or a format-level DELETE).

    Scale shape: the tombstone and doomed-order key sets are tiny
    relative to the facts, so both cascades are broadcast semi-joins —
    the fact tables are scanned but never shuffled."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = widen(load_table(spark, sf_dir, "lineitem"))
    tomb = c.filter(F.col("c_custkey") % 37 == 0).select("c_custkey")
    doomed = o.join(
        F.broadcast(tomb), o.o_custkey == tomb.c_custkey, "left_semi"
    ).select("o_orderkey")
    # single-row aggregates composed by cross join — one lazy plan,
    # no driver-side actions at build time
    a_tomb = tomb.agg(F.count(F.lit(1)).alias("customers_deleted"))
    a_orders = o.agg(F.count(F.lit(1)).alias("_orders_total"))
    a_doomed = doomed.agg(F.count(F.lit(1)).alias("orders_deleted"))
    a_lines = li.join(
        F.broadcast(doomed), li.l_orderkey == doomed.o_orderkey, "left_semi"
    ).agg(F.count(F.lit(1)).alias("lineitems_deleted"))
    return (
        a_tomb.crossJoin(a_doomed)
        .crossJoin(a_lines)
        .crossJoin(a_orders)
        .select(
            "customers_deleted",
            "orders_deleted",
            "lineitems_deleted",
            (F.col("_orders_total") - F.col("orders_deleted")).alias(
                "orders_surviving"
            ),
        )
    )


N_FP_BUCKETS = 64  # fingerprint tree fan-out


@register(
    "table_fingerprint",
    oracle=f"""
        WITH rows_h AS (
            SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                       AS BIGINT) % {N_FP_BUCKETS} AS bucket,
                   md5(CAST(o_orderkey AS VARCHAR) || '|' ||
                       CAST(o_custkey AS VARCHAR) || '|' ||
                       CAST(CAST(floor(o_totalprice * 10000) AS BIGINT)
                            AS VARCHAR)) AS h
            FROM orders
        ),
        buckets AS (
            SELECT bucket, count(*) AS n_rows,
                   md5(string_agg(h, '' ORDER BY h)) AS bucket_fp
            FROM rows_h GROUP BY bucket
        )
        SELECT bucket, n_rows, bucket_fp FROM buckets ORDER BY bucket
    """,
    tags=("governance", "integrity", "maintenance"),
)
def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy table fingerprint — the integrity primitive for
    verifying a replica/migration without moving data: each row
    hashes its content (keys + fixed-point money) to md5, rows land
    in md5-derived buckets, and each bucket publishes an
    order-insensitive digest (md5 over its sorted row hashes) plus a
    row count. Two replicas compare 64 digest rows instead of the
    table; a mismatched bucket narrows re-sync to 1/64 of the data
    (recurse for a Merkle tree).

    Scale shape: one shuffle of (bucket, 32-byte hash); the sort that
    canonicalizes each bucket happens inside the aggregate on
    collected hashes. At 100 TB, raise N_FP_BUCKETS so each bucket's
    hash list fits an executor (the tree depth is the knob, the plan
    is unchanged)."""
    o = widen(load_table(spark, sf_dir, "orders"))
    h = F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.floor(F.col("o_totalprice") * 10000).cast("long").cast("string"),
        )
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % N_FP_BUCKETS
    )
    return (
        o.select(bucket.alias("bucket"), h.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.md5(F.array_join(F.array_sort(F.collect_list("h")), "")).alias(
                "bucket_fp"
            ),
        )
        .orderBy("bucket")
    )


@register(
    "snapshot_diff",
    oracle="""
        WITH v1 AS (
            SELECT o_orderkey AS k, o_totalprice AS price FROM orders
        ),
        v2 AS (
            SELECT o_orderkey AS k,
                   CASE WHEN o_orderkey % 103 = 0
                        THEN o_totalprice + 1.0 ELSE o_totalprice END AS price
            FROM orders WHERE o_orderkey % 101 <> 0
        ),
        j AS (
            SELECT v1.k AS k1, v2.k AS k2,
                   v1.price AS p1, v2.price AS p2
            FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
        )
        SELECT
            CAST(sum(CASE WHEN k1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS added,
            CAST(sum(CASE WHEN k2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS removed,
            CAST(sum(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
                          AND p1 <> p2 THEN 1 ELSE 0 END) AS BIGINT)
                AS changed,
            CAST(sum(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
                          AND p1 = p2 THEN 1 ELSE 0 END) AS BIGINT)
                AS unchanged
        FROM j
    """,
    tags=("governance", "join", "maintenance"),
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — classify two table versions into added /
    removed / changed / unchanged counts with one full-outer join on
    the key (the audit companion to the CDC merge: merge applies a
    diff, this measures one). The second version is derived
    deterministically from the fixture (drop keys %101=0, perturb
    price on %103=0) so the expected classes are non-empty at any
    scale.

    Scale shape: one co-partitioned shuffle join on the key; with
    both snapshots bucketed on the key (io.py) the exchange
    disappears entirely. Counting is map-side partial — the join
    output never materializes."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p1"))
    v2 = (
        o.filter(F.col("o_orderkey") % 101 != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(
                F.col("o_orderkey") % 103 == 0, F.col("o_totalprice") + 1.0
            )
            .otherwise(F.col("o_totalprice"))
            .alias("p2"),
        )
    )
    j = v1.alias("a").join(v2.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
    return j.agg(
        F.sum(F.when(F.col("a.k").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("added"),
        F.sum(F.when(F.col("b.k").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("removed"),
        F.sum(
            F.when(
                F.col("a.k").isNotNull()
                & F.col("b.k").isNotNull()
                & (F.col("p1") != F.col("p2")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("changed"),
        F.sum(
            F.when(
                F.col("a.k").isNotNull()
                & F.col("b.k").isNotNull()
                & (F.col("p1") == F.col("p2")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("unchanged"),
    )


@register(
    "profile_table_columns",
    oracle="""
        SELECT 'o_custkey' AS col_name,
               count(*) AS n_rows,
               count(*) - count(o_custkey) AS n_null,
               count(DISTINCT o_custkey) AS n_distinct,
               CAST(min(o_custkey) AS VARCHAR) AS min_val,
               CAST(max(o_custkey) AS VARCHAR) AS max_val
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
               count(DISTINCT o_orderdate),
               strftime(min(o_orderdate), '%Y-%m-%d'),
               strftime(max(o_orderdate), '%Y-%m-%d')
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
               count(DISTINCT o_orderpriority),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
               count(DISTINCT o_orderstatus),
               min(o_orderstatus), max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
               count(DISTINCT o_totalprice),
               CAST(CAST(FLOOR(min(o_totalprice) * 10000) AS BIGINT) AS VARCHAR),
               CAST(CAST(FLOOR(max(o_totalprice) * 10000) AS BIGINT) AS VARCHAR)
        FROM orders
        ORDER BY col_name
    """,
    tags=("governance", "profiling", "data-quality"),
)
def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style column profiler over orders: per column, row
    count, null count, distinct cardinality, and min/max rendered to
    engine-portable strings (integers verbatim, dates as yyyy-MM-dd,
    doubles through the fixed-point BIGINT rendering — never raw
    float formatting, which differs between engines).  This is the
    first stage of any data-quality pipeline: schema-wide stats that
    feed anomaly thresholds and constraint suggestions.

    Scale shape: ONE pass per column expressed as a single aggregate
    each, unioned — Spark executes the five scans share-nothing, and
    each is a map-side-combined global aggregate with no shuffle of
    raw rows.  (A single-pass multi-column variant would use one agg
    with 5×4 expressions but loses per-column COUNT(DISTINCT)
    exactness at scale; spelled per-column here to keep distinct
    counts exact.)"""
    o = load_table(spark, sf_dir, "orders")

    def prof(col: str, minmax) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            minmax(F.min(col)).alias("min_val"),
            minmax(F.max(col)).alias("max_val"),
        )

    as_str = lambda c: c.cast("string")  # noqa: E731
    as_date = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    as_fp = lambda c: F.floor(c * 10000).cast("long").cast("string")  # noqa: E731
    return (
        prof("o_custkey", as_str)
        .unionByName(prof("o_orderdate", as_date))
        .unionByName(prof("o_orderpriority", as_str))
        .unionByName(prof("o_orderstatus", as_str))
        .unionByName(prof("o_totalprice", as_fp))
        .orderBy("col_name")
    )


@register(
    "quality_constraint_checks",
    oracle="""
        SELECT 'orderkey_unique' AS check_name,
               (SELECT count(*) FROM (
                    SELECT o_orderkey FROM orders
                    GROUP BY o_orderkey HAVING count(*) > 1)) AS n_violations
        UNION ALL
        SELECT 'custkey_ref_integrity',
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'totalprice_positive',
               (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
        UNION ALL
        SELECT 'orderdate_in_range',
               (SELECT count(*) FROM orders
                WHERE o_orderdate < TIMESTAMP '1990-01-01'
                   OR o_orderdate > TIMESTAMP '2030-01-01')
        UNION ALL
        SELECT 'status_in_domain',
               (SELECT count(*) FROM orders
                WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
        UNION ALL
        SELECT 'lineitem_orphans',
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
        ORDER BY check_name
    """,
    tags=("governance", "data-quality", "constraints"),
)
def quality_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint suite: uniqueness, referential
    integrity (both directions of the orders⋈lineitem/customer star),
    value positivity, date sanity range, and domain membership — each
    check reported as its violation count (0 = pass), the
    contract-testing layer that gates a corpus/warehouse publish.

    Scale shape: uniqueness is one groupBy-HAVING (map-side combined);
    referential checks are LEFT ANTI joins (the orders side shuffles
    once; broadcast when the dimension fits); range/domain checks are
    scan-local filter counts with predicate pushdown into parquet.
    Each check is a tiny independent job — embarrassingly parallel
    across a validation fleet."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def one(name: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    dup = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ref = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pos = o.filter(F.col("o_totalprice") <= 0).agg(F.count(F.lit(1)).alias("n"))
    rng = o.filter(
        (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
        | (F.col("o_orderdate") > F.lit("2030-01-01").cast("timestamp"))
    ).agg(F.count(F.lit(1)).alias("n"))
    dom = o.filter(~F.col("o_orderstatus").isin("O", "F", "P")).agg(
        F.count(F.lit(1)).alias("n")
    )
    orphan = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        one("custkey_ref_integrity", ref)
        .unionByName(one("lineitem_orphans", orphan))
        .unionByName(one("orderdate_in_range", rng))
        .unionByName(one("orderkey_unique", dup))
        .unionByName(one("status_in_domain", dom))
        .unionByName(one("totalprice_positive", pos))
        .orderBy("check_name")
    )


@register(
    "governance_pii_redaction",
    oracle="""
        WITH synth AS (
            SELECT c_custkey,
                   lower(replace(c_name, ' ', '.')) || '@example.com contact '
                       || c_name || ' at 555-01' || CAST(c_custkey % 100 AS VARCHAR)
                       AS raw_text
            FROM customer
        ),
        red AS (
            SELECT c_custkey, raw_text,
                   regexp_replace(
                       regexp_replace(raw_text,
                           '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                       '555-[0-9]+', '<PHONE>', 'g') AS redacted
            FROM synth
        )
        SELECT count(*) AS n_rows,
               CAST(sum(CASE WHEN redacted LIKE '%<EMAIL>%' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_email_redactions,
               CAST(sum(CASE WHEN redacted LIKE '%<PHONE>%' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_phone_redactions,
               CAST(sum(length(raw_text) - length(redacted)) AS BIGINT)
                   AS bytes_removed,
               min(redacted) AS sample_redacted
        FROM red
    """,
    tags=("governance", "pii", "redaction"),
)
def governance_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: synthesize realistic contact strings from
    customer names (deterministically — the fixture has no real PII),
    redact email and phone patterns with RE2-safe regexes, and report
    the redaction audit (rows touched per pattern, bytes removed,
    deterministic sample).  This is the scrubbing stage a corpus
    pipeline runs before publication; the audit row is what a
    compliance reviewer actually reads.

    Scale shape: map-only regexp_replace inside codegen; the audit is
    a single global aggregate with map-side combine.  The regexes
    stay in the RE2-compatible subset (no lookaround), which both
    engines implement with replace-all semantics ('g' in DuckDB,
    default in Spark)."""
    c = load_table(spark, sf_dir, "customer")
    raw = F.concat(
        F.lower(F.replace(F.col("c_name"), F.lit(" "), F.lit("."))),
        F.lit("@example.com contact "),
        F.col("c_name"),
        F.lit(" at 555-01"),
        (F.col("c_custkey") % 100).cast("string"),
    )
    synth = c.select("c_custkey", raw.alias("raw_text"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.col("raw_text"), r"[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"
        ),
        r"555-[0-9]+",
        "<PHONE>",
    )
    red = synth.select("c_custkey", "raw_text", redacted.alias("redacted"))
    return red.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("redacted").contains("<EMAIL>"), 1).otherwise(0))
        .cast("long")
        .alias("n_email_redactions"),
        F.sum(F.when(F.col("redacted").contains("<PHONE>"), 1).otherwise(0))
        .cast("long")
        .alias("n_phone_redactions"),
        F.sum(F.length("raw_text") - F.length("redacted"))
        .cast("long")
        .alias("bytes_removed"),
        F.min("redacted").alias("sample_redacted"),
    )


@register(
    "governance_l_diversity_audit",
    oracle="""
        WITH grp AS (
            SELECT n.n_name AS nation, c.c_mktsegment AS segment,
                   count(*) AS n_rows,
                   count(DISTINCT CAST(floor(c.c_acctbal / 1000) AS BIGINT))
                       AS l_distinct
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        )
        SELECT nation, segment,
               CAST(n_rows AS BIGINT) AS n_rows,
               CAST(l_distinct AS BIGINT) AS l_distinct,
               CASE WHEN l_distinct >= 3 THEN 'ok' ELSE 'violates' END
                   AS l3_status
        FROM grp ORDER BY nation, segment
    """,
    tags=("governance", "privacy", "aggregate"),
)
def governance_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the companion check to k-anonymity
    (agg_k_anonymous_rollup): a quasi-identifier group can be large
    (k-anonymous) yet leak its sensitive attribute if every member
    shares one value. Per (nation, segment) group, count distinct
    sensitive-value classes (account balance in 1000-unit bands) and
    flag groups below l = 3 — those need suppression or wider
    generalization before release.

    Scale shape: one groupBy with a two-phase count-distinct over the
    banded sensitive value — the distinct set per group is bounded by
    the band count, so partials stay small; no joins beyond the
    broadcast nation dim."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    grp = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct(
                F.floor(F.col("c_acctbal") / 1000).cast("long")
            )
            .cast("long")
            .alias("l_distinct"),
        )
    )
    return grp.select(
        "nation",
        "segment",
        "n_rows",
        "l_distinct",
        F.when(F.col("l_distinct") >= 3, "ok")
        .otherwise("violates")
        .alias("l3_status"),
    ).orderBy("nation", "segment")
