"""Differential fuzzing: random filter/group/aggregate plans built
through the DataFrame API must hash-match the equivalent SQL on
DuckDB — the same exactness gate as the oracle suite, over plans
nobody hand-wrote. Catches parity bugs the fixed query set can't
(predicate-combination edge cases, empty groups, full-filter plans).

Aggregates stay in exact integer space (count / integer sum / min /
max / count distinct) so the comparison is bit-exact by construction;
the fixed-point-double discipline is covered by the oracle suite.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafkastreamer_spark.tables import load_table
from tests._compare import assert_matches_oracle

SLOW_OK = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]

# (sql predicate, spark Column builder) pairs — same semantics by text
PREDICATES = [
    ("l_quantity <= {q}", lambda q: F.col("l_quantity") <= q),
    ("l_quantity > {q}", lambda q: F.col("l_quantity") > q),
    ("l_orderkey % 7 = {m}", lambda m: F.col("l_orderkey") % 7 == m),
    ("l_partkey >= {p}", lambda p: F.col("l_partkey") >= p),
]

# Column builders are thunks: pyspark Columns need an active session,
# which doesn't exist at collection time.
AGGS = {
    "n_rows": ("CAST(COUNT(*) AS BIGINT)", lambda: F.count(F.lit(1)).cast("long")),
    "sum_qty": (
        "CAST(COALESCE(SUM(l_quantity), 0) AS BIGINT)",
        lambda: F.coalesce(F.sum("l_quantity"), F.lit(0)).cast("long"),
    ),
    "min_pk": ("MIN(l_partkey)", lambda: F.min("l_partkey")),
    "max_ok": ("MAX(l_orderkey)", lambda: F.max("l_orderkey")),
    "n_orders": (
        "CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)",
        lambda: F.countDistinct("l_orderkey").cast("long"),
    ),
}


@st.composite
def plans(draw):
    preds = draw(
        st.lists(
            st.tuples(
                st.sampled_from(PREDICATES), st.integers(min_value=0, max_value=60)
            ),
            min_size=0,
            max_size=3,
        )
    )
    groups = draw(st.lists(st.sampled_from(GROUP_COLS), max_size=2, unique=True))
    aggs = draw(
        st.lists(st.sampled_from(sorted(AGGS)), min_size=1, max_size=4, unique=True)
    )
    return preds, groups, aggs


@SLOW_OK
@given(plan=plans())
def test_random_plan_matches_duckdb(spark, sf_dir, oracle_con, plan):
    preds, groups, aggs = plan
    li = load_table(spark, sf_dir, "lineitem")

    sql_preds, df = [], li
    for (sql_t, col_f), v in preds:
        sql_preds.append(sql_t.format(q=v, m=v % 7, p=v * 100))
        arg = v % 7 if "% 7" in sql_t else (v * 100 if "l_partkey" in sql_t else v)
        df = df.filter(col_f(arg))

    agg_cols = [AGGS[a][1]().alias(a) for a in aggs]
    if groups:
        df = df.groupBy(*groups).agg(*agg_cols)
    else:
        df = df.agg(*agg_cols)

    where = (" WHERE " + " AND ".join(sql_preds)) if sql_preds else ""
    sel_aggs = ", ".join(f"{AGGS[a][0]} AS {a}" for a in aggs)
    if groups:
        g = ", ".join(groups)
        sql = f"SELECT {g}, {sel_aggs} FROM lineitem{where} GROUP BY {g}"
    else:
        sql = f"SELECT {sel_aggs} FROM lineitem{where}"

    assert_matches_oracle(df, oracle_con, sql, name=f"fuzz:{sql[:90]}")


@st.composite
def join_plans(draw):
    o_cut = draw(st.integers(min_value=0, max_value=5))  # priority prefix 1-5
    q_cut = draw(st.integers(min_value=0, max_value=60))
    groups = draw(
        st.lists(
            st.sampled_from(["o_orderpriority", "o_orderstatus", "l_returnflag"]),
            max_size=2,
            unique=True,
        )
    )
    aggs = draw(
        st.lists(st.sampled_from(sorted(AGGS)), min_size=1, max_size=3, unique=True)
    )
    return o_cut, q_cut, groups, aggs


@SLOW_OK
@given(plan=join_plans())
def test_random_join_plan_matches_duckdb(spark, sf_dir, oracle_con, plan):
    """Equi-join fuzz: orders ⋈ lineitem with random filters on both
    sides and random integer aggregates, vs the same SQL on DuckDB."""
    o_cut, q_cut, groups, aggs = plan
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    o_f = o.filter(F.substring("o_orderpriority", 1, 1) > str(o_cut))
    l_f = li.filter(F.col("l_quantity") > q_cut)
    j = o_f.join(l_f, o_f.o_orderkey == l_f.l_orderkey)

    agg_cols = [AGGS[a][1]().alias(a) for a in aggs]
    df = j.groupBy(*groups).agg(*agg_cols) if groups else j.agg(*agg_cols)

    sel_aggs = ", ".join(f"{AGGS[a][0]} AS {a}" for a in aggs)
    base = (
        f"FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        f"WHERE substring(o.o_orderpriority, 1, 1) > '{o_cut}' "
        f"AND l.l_quantity > {q_cut}"
    )
    if groups:
        g = ", ".join(groups)
        sql = f"SELECT {g}, {sel_aggs} {base} GROUP BY {g}"
    else:
        sql = f"SELECT {sel_aggs} {base}"
    assert_matches_oracle(df, oracle_con, sql, name=f"fuzz-join:{sql[:80]}")


WINDOW_FNS = {
    # (sql template over the named window, spark builder over w)
    "rn": (
        "ROW_NUMBER() OVER ({w})",
        lambda w: F.row_number().over(w),
    ),
    "rk": (
        "RANK() OVER ({w})",
        lambda w: F.rank().over(w),
    ),
    "lag_pk": (
        "LAG(l_partkey) OVER ({w})",
        lambda w: F.lag("l_partkey").over(w),
    ),
    "run_cnt": (
        "CAST(COUNT(*) OVER ({w} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT"
        " ROW) AS BIGINT)",
        lambda w: F.count(F.lit(1))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    ),
}


@st.composite
def window_plans(draw):
    part = draw(st.sampled_from(GROUP_COLS))
    fns = draw(
        st.lists(
            st.sampled_from(sorted(WINDOW_FNS)), min_size=1, max_size=3, unique=True
        )
    )
    q_cut = draw(st.integers(min_value=30, max_value=60))
    return part, fns, q_cut


@SLOW_OK
@given(plan=window_plans())
def test_random_window_plan_matches_duckdb(spark, sf_dir, oracle_con, plan):
    """Window-function fuzz: random analytic functions over a random
    partition key, vs the same SQL on DuckDB. (orderkey, linenumber)
    is NOT unique in the synthetic fixture — this fuzzer caught that
    as a LAG nondeterminism — so the sort key includes l_partkey: any
    remaining ties are identical in every output column, making each
    window function's output multiset deterministic."""
    part, fns, q_cut = plan
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > q_cut)

    w = Window.partitionBy(part).orderBy("l_orderkey", "l_linenumber", "l_partkey")
    df = li.select(
        "l_orderkey",
        "l_linenumber",
        part,
        *[WINDOW_FNS[f][1](w).alias(f) for f in fns],
    )

    w_sql = f"PARTITION BY {part} ORDER BY l_orderkey, l_linenumber, l_partkey"
    sel = ", ".join(WINDOW_FNS[f][0].format(w=w_sql) + f" AS {f}" for f in fns)
    sql = (
        f"SELECT l_orderkey, l_linenumber, {part}, {sel} "
        f"FROM lineitem WHERE l_quantity > {q_cut}"
    )
    assert_matches_oracle(df, oracle_con, sql, name=f"fuzz-window:{sql[:80]}")


@st.composite
def setop_plans(draw):
    op = draw(st.sampled_from(["union_all", "intersect", "except_"]))
    a_cut = draw(st.integers(min_value=10, max_value=50))
    b_cut = draw(st.integers(min_value=10, max_value=50))
    return op, a_cut, b_cut


@SLOW_OK
@given(plan=setop_plans())
def test_random_setop_matches_duckdb(spark, sf_dir, oracle_con, plan):
    """Set-operation fuzz: two filtered integer projections combined
    by a random UNION ALL / INTERSECT / EXCEPT, vs DuckDB. INTERSECT
    and EXCEPT are the distinct (set) forms in both engines."""
    op, a_cut, b_cut = plan
    li = load_table(spark, sf_dir, "lineitem")
    proj = ["l_orderkey", "l_linenumber"]
    a = li.filter(F.col("l_quantity") > a_cut).select(*proj)
    b = li.filter(F.col("l_partkey") % 3 == b_cut % 3).select(*proj)
    if op == "union_all":
        df, sql_op = a.unionAll(b), "UNION ALL"
    elif op == "intersect":
        df, sql_op = a.intersect(b), "INTERSECT"
    else:
        df, sql_op = a.subtract(b), "EXCEPT"  # set semantics, like SQL
    cols = ", ".join(proj)
    sql = (
        f"SELECT {cols} FROM lineitem WHERE l_quantity > {a_cut} "
        f"{sql_op} "
        f"SELECT {cols} FROM lineitem WHERE l_partkey % 3 = {b_cut % 3}"
    )
    assert_matches_oracle(df, oracle_con, sql, name=f"fuzz-setop:{op}")


@SLOW_OK
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=-(10**12), max_value=10**12),
            st.integers(min_value=1, max_value=10**9),
        ),
        min_size=1,
        max_size=24,
    )
)
def test_sign_split_fixed_point_matches_duckdb(spark, pairs):
    """The engine's sign-split fixed-point convention (negatives routed
    through -((1e4*|num|) div den) so Spark's truncating `div` and
    DuckDB's flooring `//` agree) must hold for ARBITRARY integers,
    not just the fixture values the qini/cross-corr oracles happen to
    produce. Also pins the positive path and the `% `/`div` pair."""
    import duckdb

    df = spark.createDataFrame(pairs, "num long, den long")
    got = {
        (r["num"], r["den"], r["fp4"], r["q"], r["m"])
        for r in df.selectExpr(
            "num",
            "den",
            "CASE WHEN num < 0 THEN -((10000 * (-num)) div den)"
            " ELSE (10000 * num) div den END AS fp4",
            "CASE WHEN num < 0 THEN -((-num) div den)"
            " ELSE num div den END AS q",
            "CASE WHEN num < 0 THEN -((-num) % den)"
            " ELSE num % den END AS m",
        ).collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"({n}, {d})" for n, d in pairs)
    want = set(
        con.execute(
            f"""
            SELECT num, den,
                   CASE WHEN num < 0 THEN -((10000 * (-num)) // den)
                        ELSE (10000 * num) // den END AS fp4,
                   CASE WHEN num < 0 THEN -((-num) // den)
                        ELSE num // den END AS q,
                   CASE WHEN num < 0 THEN -((-num) % den)
                        ELSE num % den END AS m
            FROM (SELECT CAST(num AS BIGINT) AS num,
                         CAST(den AS BIGINT) AS den
                  FROM (VALUES {vals}) AS t(num, den))
            """
            # DuckDB types bare integer literals INT32, so 10000*num
            # overflows without the cast — found by hypothesis. Real
            # oracles are immune: every compared column is CAST AS
            # BIGINT at its aggregate, which is exactly the discipline
            # this cast mirrors.
        ).fetchall()
    )
    assert got == want
