"""Shared helpers for the query library.

The driver compares Spark results against DuckDB by value-hash, so
floating-point aggregates must be bit-identical across engines.
Summing doubles is order-dependent, and even double→DECIMAL casts
round differently (HALF_UP in Spark vs round-half-even in DuckDB). The
engine's canonical money arithmetic is therefore fixed-point: scale by
10^4, ``floor`` to an exact BIGINT (identical IEEE ops in both
engines), sum exactly in integer space, and divide once at the end.
Every aggregate built this way hashes identically across engines
regardless of partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10000  # fixed-point scale: 4 decimal digits


def _c(col) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def fixed(col) -> Column:
    """Double column → exact fixed-point BIGINT (floor(x * 10^4))."""
    return F.floor(_c(col) * SCALE).cast("long")


def dsum(col, alias: str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return (F.sum(fixed(col)).cast("double") / SCALE).alias(alias)


def dsum0(col, alias: str) -> Column:
    """Like dsum but COALESCEd to 0 (for outer-join aggregates)."""
    return (F.coalesce(F.sum(fixed(col)), F.lit(0)).cast("double") / SCALE).alias(alias)


def davg(col, alias: str) -> Column:
    """Order-independent average: exact fixed-point sum / count."""
    c = _c(col)
    return ((F.sum(fixed(c)).cast("double") / SCALE) / F.count(c)).alias(alias)


def wsum(col, window) -> Column:
    """Windowed order-independent sum (no alias; caller aliases)."""
    return F.sum(fixed(col)).over(window).cast("double") / SCALE


# --- SQL-side counterparts (DuckDB dialect; identical semantics) -----------


def sql_fixed(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * {SCALE}) AS BIGINT)"


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({sql_fixed(expr)}) AS DOUBLE) / {SCALE} AS {alias}"


def sql_dsum0(expr: str, alias: str) -> str:
    return (
        f"CAST(COALESCE(SUM({sql_fixed(expr)}), 0) AS DOUBLE) / {SCALE} AS {alias}"
    )


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM({sql_fixed(expr)}) AS DOUBLE) / {SCALE}"
        f" / COUNT({expr}) AS {alias}"
    )


def fmt_date(col, alias: str) -> Column:
    """Render a timestamp column as yyyy-MM-dd string (cross-engine safe)."""
    return F.date_format(_c(col), "yyyy-MM-dd").alias(alias)


def epoch_us(col) -> Column:
    """Microseconds since epoch from a TIMESTAMP *or* TIMESTAMP_NTZ column.

    ``unix_micros`` only accepts TIMESTAMP (LTZ); fixture regenerations
    have shipped ``events.ts`` as both LTZ and NTZ, so every
    ts-arithmetic site goes through this helper. The NTZ→LTZ cast is
    value-preserving because the session timezone is pinned UTC
    (session.py), matching DuckDB's naive-timestamp ``epoch_us``.
    """
    return F.unix_micros(_c(col).cast("timestamp"))


def epoch_s(col) -> Column:
    """Whole seconds since epoch (timestamp-type agnostic, see epoch_us)."""
    return _c(col).cast("timestamp").cast("long")
