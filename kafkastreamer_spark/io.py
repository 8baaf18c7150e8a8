"""Batch sink adapters (SURVEY.md §2-B "Sinks") and bucketed-table
support for co-located joins.

At 100 TB the expensive part of repeated joins/aggregations on the
same key is the exchange. Writing a table bucketed on its join key
materializes that partitioning once: subsequent equi-joins between
tables bucketed on the same key with the same bucket count run with
NO shuffle on either side (SortMergeJoin over co-located buckets).
The plan test asserts the Exchange-free join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Plain columnar sink; optional hive-style partition pruning
    columns (date/tenant columns at scale — not high-cardinality keys)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize a table bucketed (and optionally sorted) on its
    join key. Bucket count must match across tables that will join
    co-located; sorting inside buckets lets SortMergeJoin skip its
    sort as well."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables; with matching bucket spec the plan
    contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def compact_small_files(
    spark: SparkSession, path: str, target_files: int, mode: str = "overwrite"
) -> int:
    """Small-file compaction — the table-maintenance pass every long-
    running ingest needs: streaming sinks and partitioned appends leave
    thousands of KB-sized files whose per-file open/footer cost
    eventually dominates scans. Rewrites the dataset into
    ``target_files`` files via coalesce (no shuffle — merges existing
    partitions) and atomically swaps directories. Returns the file
    count after compaction.

    At scale this runs per partition-directory (day/tenant) so only
    cold partitions rewrite; compaction of a live table needs a
    transactional format's commit protocol on top.
    """
    import glob
    import os
    import shutil

    df = spark.read.parquet(path)
    tmp = path + ".compact_tmp"
    df.coalesce(target_files).write.mode(mode).parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return len(glob.glob(os.path.join(path, "*.parquet")))


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: union the footers of heterogeneous
    parquet batches (columns added over time) into one wide schema,
    nulls for the batches that predate a column. The per-footer merge
    is why production tables carry the unified schema in a catalog
    instead (mergeSchema scans every footer at planning time — fine
    per-partition, wasteful over 10^6 files)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def write_audit_publish(
    df: DataFrame,
    publish_path: str,
    checks: list,
    staging_path: str | None = None,
) -> dict:
    """Write-Audit-Publish: stage the data, run validation checks
    against the STAGED files (what readers would actually see), and
    only then move them to the published location — the pattern that
    keeps a bad batch from ever being visible to consumers (Iceberg's
    WAP branch / Delta's constraint-checked commit, expressed on
    plain parquet directories).

    ``checks`` is a list of ``(name, fn)`` where ``fn(staged_df) ->
    number_of_violations``; any nonzero violation count aborts the
    publish and leaves the staging directory for inspection.  Returns
    an audit report dict (per-check violations, published flag,
    row count).

    Scale note: the extra cost over a direct write is one read-back
    of the staged files for validation — exactly the audit a
    production pipeline must pay somewhere; doing it pre-publish
    makes failure cheap (no consumer saw the data, no rollback).
    The final move is a filesystem rename: metadata-only on
    HDFS/object stores with atomic rename semantics."""
    import os
    import shutil

    staging = staging_path or publish_path + "._staging"
    spark = df.sparkSession
    df.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    report: dict = {"checks": {}, "published": False}
    report["n_rows"] = staged.count()
    ok = True
    for name, fn in checks:
        violations = int(fn(staged))
        report["checks"][name] = violations
        if violations:
            ok = False
    if ok:
        if os.path.exists(publish_path):
            shutil.rmtree(publish_path)
        os.rename(staging, publish_path)
        report["published"] = True
    return report
