"""Differential fuzzing for the recursive-CTE surface (relational17):
randomly parameterized depth-bounded recursions — generator arithmetic
and a keyed walk over a real table — as ONE shared-dialect SQL string
executed by both Spark and DuckDB, hash-compared exactly.

Everything stays in BIGINT space (exact on both engines); depths are
capped far below Spark's 100-level default ceiling, which the batch's
dialect pins (tests/test_recursive_cte.py) assert separately.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafkastreamer_spark.sql import run_sql
from tests._compare import assert_matches_oracle

SLOW_OK = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

AGGS = {
    "n": "CAST(count(*) AS BIGINT)",
    "total": "CAST(sum(v) AS BIGINT)",
    "lo": "CAST(min(v) AS BIGINT)",
    "hi": "CAST(max(v) AS BIGINT)",
}


@SLOW_OK
@given(
    start=st.integers(min_value=-1000, max_value=1000),
    step=st.integers(min_value=-50, max_value=50),
    mult=st.integers(min_value=1, max_value=3),
    depth=st.integers(min_value=1, max_value=80),
    aggs=st.lists(st.sampled_from(sorted(AGGS)), min_size=1, max_size=4, unique=True),
)
def test_random_affine_recursion(spark, sf_dir, oracle_con, start, step, mult, depth, aggs):
    """v' = (v*mult + step) mod p for `depth` levels; reduce with
    random exact integer aggregates. The per-level modulus keeps v in
    BIGINT space on BOTH engines (overflow behavior is NOT in the
    dialect intersection); both engines use sign-of-dividend `%`, so
    negative starts stay bit-identical too."""
    sel = ", ".join(f"{AGGS[a]} AS {a}" for a in aggs)
    q = f"""
        WITH RECURSIVE r(i, v) AS (
            SELECT CAST(1 AS BIGINT), CAST({start} AS BIGINT)
            UNION ALL
            SELECT i + 1, (v * {mult} + {step}) % 1000000007
            FROM r WHERE i < {depth}
        )
        SELECT {sel} FROM r
    """
    assert_matches_oracle(
        run_sql(spark, sf_dir, q),
        oracle_con,
        q,
        name=f"rec-fuzz:start={start},step={step},mult={mult},depth={depth}",
    )


@SLOW_OK
@given(
    hops=st.integers(min_value=1, max_value=24),
    stride=st.integers(min_value=1, max_value=7),
    keep=st.integers(min_value=1, max_value=5),
)
def test_random_keyed_walk_over_nation(spark, sf_dir, oracle_con, hops, stride, keep):
    """Keyed walk over a real table: from each seed nation, hop
    key -> key + stride for `hops` levels (dropping walks that leave
    the key range — a data-dependent frontier), accumulating the
    visited regionkeys. Joins per level, exactly like the customer
    chain entry, with a random seed slice."""
    q = f"""
        WITH RECURSIVE walk(seed, k, acc) AS (
            SELECT n_nationkey, n_nationkey, n_regionkey
            FROM nation WHERE n_nationkey % {keep + 1} = 0
            UNION ALL
            SELECT w.seed, n.n_nationkey, w.acc + n.n_regionkey
            FROM walk w JOIN nation n ON n.n_nationkey = w.k + {stride}
            WHERE n.n_nationkey - w.seed < {hops} * {stride}
        )
        SELECT seed, CAST(count(*) AS BIGINT) AS n_hops,
               CAST(max(acc) AS BIGINT) AS acc_end
        FROM walk GROUP BY seed ORDER BY seed
    """
    assert_matches_oracle(
        run_sql(spark, sf_dir, q),
        oracle_con,
        q,
        name=f"walk-fuzz:hops={hops},stride={stride},keep={keep}",
    )
