"""Exact, skew-free per-group ranking — the two-phase replacement for
``row_number() OVER (PARTITION BY group ORDER BY ...)`` when a single
group can hold an unbounded share of the corpus.

The naive per-group window shuffles every row of a group to ONE
reducer and sorts there: at 100 TB with ~10 languages that is a
multi-terabyte single-task sort per language — the textbook skew
killer (flagged `weak` in round-1 VERDICT.md for
``pipeline_corpus_prep`` and the balanced-class sampler).

The fix here is *exact*, not approximate: split each group's sort key
space into order-consistent buckets, count rows per (group, bucket)
with an ordinary map-side-combining aggregate, turn the tiny counts
table into per-bucket rank offsets with a window over |groups|×|buckets|
rows, then compute each row's global rank as

    offset(group, bucket) + row_number() OVER (PARTITION BY group, bucket
                                               ORDER BY <tail of sort key>)

Because the bucket is a prefix of the sort key, (bucket, tail) orders
identically to the original key, so the computed rank is bit-identical
to the single-window formulation — same rows selected, same oracle
hashes — while the largest sort partition shrinks by the bucket fan-out
(4096× for the 3-hex-digit md5 prefix used by the samplers).

Scale shape: one shuffle of the (narrow) main data on (group, bucket)
serves both the offset join and the local window; the counts side is
|distinct (group, bucket)| rows — KBs for low-cardinality groups (lang
× 4096 md5 buckets), but potentially huge for high-cardinality groups
(e.g. group = URL domain), so the join carries NO broadcast hint: AQE
picks broadcast when the runtime size is under the threshold and falls
back to sort-merge (which reuses the same (group, bucket) partitioning
as the local window) otherwise. No single-task sort of a full group
remains — asserted by plan tests in ``tests/test_deskew.py``.

NULL keys: join keys use ``eqNullSafe``, so rows with NULL group keys
or a NULL bucket value keep their rank exactly as the window
formulation keeps NULL partitions (an inner equi-join would silently
drop them; the fixtures have no NULLs, so
``tests/test_deskew.py::test_null_group_and_bucket_rows_kept`` pins
the parity on a synthetic NULL-bearing frame).

Reference grounding: the reference engine has no per-group ranking at
all (it is a 1-record/s keyed streamer, SURVEY.md §2-A); this module
serves the §2-B sampling/quality closure at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BKT = "_dsk_bkt"
_OFF = "_dsk_off"
_BC = "_dsk_bc"


def bucketed_row_number(
    df: DataFrame,
    part_cols: Sequence[str],
    bucket: Column,
    local_order: Sequence[Column],
    rank_name: str,
    *,
    count_name: str | None = None,
    bucket_desc: bool = False,
) -> DataFrame:
    """Exact equivalent of::

        row_number() OVER (PARTITION BY part_cols
                           ORDER BY bucket [DESC], *local_order)

    without any single-task-per-group sort.  ``bucket`` must be a
    prefix of the intended sort key (rows comparing equal on it are
    ordered by ``local_order``).  Optionally also emits the exact
    per-group row count as ``count_name`` — computed from the tiny
    counts aggregate instead of an unbounded ``count(*) OVER
    (PARTITION BY group)`` window, which would co-locate whole groups
    just to count them.
    """
    part_cols = list(part_cols)
    t = df.withColumn(_BKT, bucket)

    counts = t.groupBy(*part_cols, _BKT).agg(F.count(F.lit(1)).alias(_BC))
    border = F.col(_BKT).desc() if bucket_desc else F.col(_BKT).asc()
    woff = (
        Window.partitionBy(*part_cols)
        .orderBy(border)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.withColumn(_OFF, F.coalesce(F.sum(_BC).over(woff), F.lit(0)))
    if count_name is not None:
        offs = offs.withColumn(
            count_name, F.sum(_BC).over(Window.partitionBy(*part_cols))
        )
    keep = part_cols + [_BKT, _OFF] + ([count_name] if count_name else [])

    # Null-safe equi-join (<=>): NULL group keys / bucket values keep
    # their rows, matching the window formulation's NULL partitions.
    # No broadcast hint — offsets is |distinct (group, bucket)| rows,
    # which for high-cardinality groups can approach |rows|; AQE
    # broadcasts it when it is actually small.
    join_keys = part_cols + [_BKT]
    right = offs.select(*keep)
    for c in join_keys:
        right = right.withColumnRenamed(c, f"_r_{c}")
    cond = None
    for c in join_keys:
        e = t[c].eqNullSafe(right[f"_r_{c}"])
        cond = e if cond is None else cond & e

    wloc = Window.partitionBy(*part_cols, _BKT).orderBy(*local_order)
    return (
        t.join(right, on=cond)
        .drop(*[f"_r_{c}" for c in join_keys])
        .withColumn(rank_name, F.row_number().over(wloc) + F.col(_OFF))
        .drop(_BKT, _OFF)
    )


def md5_ranked(
    df: DataFrame,
    part_cols: Sequence[str],
    key_col: str = "doc_id",
    rank_name: str = "rn",
    *,
    count_name: str | None = None,
    nhex: int = 3,
) -> DataFrame:
    """Skew-free exact rank for the samplers' canonical ordering
    ``ORDER BY md5(CAST(key AS VARCHAR)), key``.

    The bucket is the first ``nhex`` hex digits of the md5 as an
    integer: md5 output is lowercase hex, whose lexicographic order
    equals its numeric order, so (prefix, full-hash) sorts identically
    to (full-hash) and the rank is bit-identical to the global window.
    md5 is uniform, so the 16**nhex buckets are balanced regardless of
    corpus skew — the heaviest sort partition is ~group/4096 at the
    default ``nhex=3``.
    """
    h = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, nhex), 16, 10).cast("long")
    return bucketed_row_number(
        df,
        part_cols,
        bucket,
        [h.asc(), F.col(key_col).asc()],
        rank_name,
        count_name=count_name,
    )


def bucketed_running_agg(
    df: DataFrame,
    part_cols: Sequence[str],
    buckets: Sequence[tuple[Column, bool]],
    local_order: Sequence[Column],
    value_col: Column | str,
    out_name: str,
    *,
    op: str = "sum",
) -> DataFrame:
    """Exact equivalent of::

        <op>(value) OVER (PARTITION BY part_cols
                          ORDER BY <bucket keys>, *local_order
                          ROWS UNBOUNDED PRECEDING .. CURRENT ROW)

    for an associative ``op`` ('sum' or 'max') — the running-aggregate
    sibling of ``bucketed_row_number``, without the single-task
    whole-group sort. ``buckets`` is a list of ``(expr, desc)`` pairs
    that must be an order-consistent PREFIX of the intended sort key
    (rows equal on all bucket exprs are ordered by ``local_order``);
    multiple levels let a tiny-domain leading key (quality score) pair
    with a range bucket on the tie-break (doc_id // W).

    Phase 1 aggregates ``op(value)`` per (group, buckets) map-side;
    phase 2 turns the tiny per-bucket table into EXCLUSIVE prefix
    offsets with a window over |groups|x|buckets| rows; phase 3 joins
    the offsets back (null-safe, AQE-broadcast when small) and adds a
    per-bucket local running aggregate. ``value_col`` must be
    non-null (aggregate before calling if it isn't).
    """
    part_cols = list(part_cols)
    aggf = {"sum": F.sum, "max": F.max}[op]
    bcols = [f"{_BKT}{i}" for i in range(len(buckets))]
    t = df
    for name, (expr, _desc) in zip(bcols, buckets):
        t = t.withColumn(name, expr)

    totals = t.groupBy(*part_cols, *bcols).agg(aggf(value_col).alias(_BC))
    order = [
        (F.col(n).desc() if desc else F.col(n).asc())
        for n, (_e, desc) in zip(bcols, buckets)
    ]
    woff = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.withColumn(_OFF, aggf(_BC).over(woff))  # null in 1st bucket

    join_keys = part_cols + bcols
    right = offs.select(*join_keys, _OFF)
    for c in join_keys:
        right = right.withColumnRenamed(c, f"_r_{c}")
    cond = None
    for c in join_keys:
        e = t[c].eqNullSafe(right[f"_r_{c}"])
        cond = e if cond is None else cond & e

    wloc = (
        Window.partitionBy(*part_cols, *bcols)
        .orderBy(*local_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = aggf(value_col).over(wloc)
    if op == "sum":
        combined = F.coalesce(F.col(_OFF), F.lit(0)) + local
    else:  # max
        combined = F.when(F.col(_OFF).isNull(), local).otherwise(
            F.greatest(F.col(_OFF), local)
        )
    return (
        t.join(right, on=cond)
        .drop(*[f"_r_{c}" for c in join_keys])
        .withColumn(out_name, combined)
        .drop(_OFF, *bcols)
    )
