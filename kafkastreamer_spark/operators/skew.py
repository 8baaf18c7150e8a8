"""Skew mitigation (SURVEY.md "Partitioning & shuffle" posture).

AQE's skew-join splitting handles storage-level skew automatically;
what it cannot fix is a *hot key* in an aggregation or join — one key
whose group lands on one task. The standard fix is salting:

* aggregation: two-phase — pre-aggregate on (key, salt), then final
  aggregate on key. The hot key's work spreads across `n_salts` tasks
  and the second shuffle moves only n_salts rows per key.
* join: replicate the build side n_salts ways, salt the skewed probe
  side deterministically, join on (key, salt).

Both transformations are result-identical to their unsalted forms —
``skew_salted_agg`` is oracle-checked against the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.queries._util import sql_dsum
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of the given columns
    (default: all) — reproducible across retries, unlike rand()."""
    cols = cols or df.columns
    return df.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot keys.

    ``aggs`` maps output name → phase-1 aggregate Column; phase 2
    re-aggregates with the matching combiner (sum for sums/counts, min
    for min, max for max — caller provides decomposable aggregates as
    (phase1, phase2) via the conventions below: this helper handles
    the common sum/count case where phase 2 is SUM of phase-1 outputs).
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(key, "_salt").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    return phase1.groupBy(key).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )


@register(
    "skew_salted_agg",
    oracle=f"""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               {sql_dsum("l_extendedprice", "total_price")}
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("relational", "agg", "skew"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via salting: count + exact fixed-point sum
    per returnflag (3 keys over the whole table — exactly the shape
    where one reducer would own a third of 100 TB). Result is
    bit-identical to the plain GROUP BY (the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        "l_returnflag",
        {
            "n_rows": F.count(F.lit(1)),
            "fp_price": F.sum(F.floor(F.col("l_extendedprice") * 10000).cast("long")),
        },
        n_salts=16,
    )
    return (
        out.select(
            "l_returnflag",
            "n_rows",
            (F.col("fp_price").cast("double") / 10000).alias("total_price"),
        )
        .orderBy("l_returnflag")
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi join: salt the skewed side deterministically and
    replicate the small side across every salt value. Use when the
    small side is too big to broadcast but the key distribution is
    hot enough to stall a sort-merge join."""
    # salt from ALL columns, not the key: hashing only the key would
    # put each hot key into a single salt bucket and spread nothing
    s = with_salt(skewed, n_salts)
    r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return s.join(r, on=[key, "_salt"]).drop("_salt")


@register(
    "join_skew_salted",
    oracle=f"""
        SELECT s.s_name AS supplier,
               COUNT(*) AS n_items,
               {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_name ORDER BY supplier
    """,
    tags=("skew", "join", "salting"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe join via salting, oracle-checked to be
    result-identical to the plain join: the probe side (lineitem)
    gets a deterministic salt in [0, 8); the build side (supplier)
    replicates 8× with every salt value; the join key becomes
    (suppkey, salt), so a hot supplier's rows spread over 8 tasks
    instead of one.  The post-join aggregation re-collapses on the
    natural key — revenue sums are fixed-point, so the salted plan
    hashes identically to the unsalted oracle.

    Scale shape: this is the manual fix for the skew AQE cannot touch
    (a hot key inside one shuffle partition, or a broadcast-too-big
    build side).  Cost model: build side ×8 replication (still tiny)
    buys ×8 parallelism on the hottest probe key; salt count scales
    with observed skew ratio.  With AQE skew-join enabled the
    unsalted plan is often enough — this operator is for the
    deterministic-layout cases (bucketed tables, stateful streaming)
    where runtime splitting isn't available."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n_salts = 8
    probe = li.select(
        "l_suppkey",
        "l_extendedprice",
        "l_discount",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salts)).alias(
            "_salt"
        ),
    )
    build = s.select(
        "s_suppkey",
        "s_name",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt"),
    )
    rev_fp = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        probe.join(
            F.broadcast(build),
            (probe.l_suppkey == build.s_suppkey) & (probe._salt == build._salt),
        )
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(rev_fp).cast("double") / 10000).alias("revenue"),
        )
        .orderBy("supplier")
    )
