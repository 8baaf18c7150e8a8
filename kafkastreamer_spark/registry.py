"""Central query registry — the engine's operator catalog.

Every batch operator/query the engine claims is registered here with:

* ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
* ``oracle`` — equivalent ANSI SQL that DuckDB runs over the same
  parquet tables (None for genuinely non-SQL-expressible ops, which
  the driver then checks rows-only);
* ``tags`` — coverage bookkeeping against SURVEY.md §2.

``__spark_entry__.py`` exposes this registry to the verification
driver. Column-name parity between ``fn`` and ``oracle`` is part of
the contract (the driver hashes values after sorting columns by name).

Determinism rules used throughout the query library:

* Double aggregations go through DECIMAL so Spark and DuckDB sum
  exactly the same value regardless of partial-aggregation order, then
  cast back to double (see ``dec``/``dsum`` helpers in queries/_util).
* Timestamps in outputs are formatted to strings.
* Every ordered/limited query has a total-order tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the engine catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def _ensure_loaded() -> None:
    # Import side-effect populates REGISTRY.
    import kafkastreamer_spark.queries  # noqa: F401
