"""Oracle comparison helper mirroring the driver's correctness gate:
row-count, column names, and order-insensitive exact value equality.

Exactness is deliberate — the driver hashes values, so a result that
differs in the last double bit FAILS there. Tests here therefore
assert bit-exact equality (after canonical string rendering), which is
what the query library's DECIMAL-sum discipline guarantees.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _canon(v):
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def rows_to_multiset(columns, rows):
    """Sort columns by name (driver behavior), canonicalize values,
    return a sorted list of row tuples."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_matches_oracle(spark_df, oracle_con, oracle_query: str, name: str = "query"):
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = oracle_con.execute(oracle_query)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count mismatch spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = rows_to_multiset(spark_cols, spark_rows)
    d = rows_to_multiset(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
