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


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC columnar sink — same predicate-pushdown/column-pruning
    properties as parquet (Spark's ORC reader is vectorized and
    supports pushed filters); the interchange format for Hive-lineage
    warehouses."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """XML sink (built-in data source since Spark 4) — the reference's
    own interchange format (its topology spec is XML,
    v1/ParserKafka/template.xml); here it covers row data too."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row"
) -> DataFrame:
    """XML source with schema inference (pass a .schema() upstream for
    production reads — inference scans the data once)."""
    return spark.read.format("xml").option("rowTag", row_tag).load(path)


def read_text_corpus(
    spark: SparkSession, path: str, wholetext: bool = True
) -> DataFrame:
    """Ingest raw text files into the engine's documents shape
    ``(doc_id, text, source)``.

    ``wholetext=True``: one document per file, doc_id =
    ``xxhash64(file URI)`` — deterministic across runs and cluster
    layouts (unlike ``monotonically_increasing_id``, which depends on
    partition assignment). ``wholetext=False``: one document per line
    with doc_id = ``xxhash64(file URI, line)``; identical lines within
    one file collapse to one id — for corpus ingest that is the
    desired exact-dedup-on-entry semantics, and cross-file duplicates
    keep distinct ids for the dedup operators to find.

    Scale: the text source splits by file (wholetext) or by range
    (line mode), so a 100 TB corpus parallelizes without any driver
    involvement; doc_id needs no global coordination.
    """
    from pyspark.sql import functions as F

    df = spark.read.text(path, wholetext=wholetext).select(
        F.input_file_name().alias("source"), F.col("value").alias("text")
    )
    if wholetext:
        doc_id = F.xxhash64(F.col("source"))
    else:
        doc_id = F.xxhash64(F.col("source"), F.col("text"))
    return df.select(doc_id.alias("doc_id"), "text", "source")


# Extension → modality for binary ingest; anything else is "blob".
_MODALITY_BY_EXT = {
    "jpg": "image",
    "jpeg": "image",
    "png": "image",
    "gif": "image",
    "webp": "image",
    "wav": "audio",
    "mp3": "audio",
    "flac": "audio",
    "ogg": "audio",
    "mp4": "video",
    "mkv": "video",
    "webm": "video",
    "avi": "video",
}


def read_binary_corpus(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Ingest opaque binary files (image/audio/video) as
    ``(asset_id, uri, modality, n_bytes, content)`` — the input shape
    of the multimodal operators (``operators/multimodal.py``), which
    treat content as an opaque ``binary`` column plus typed metadata.

    Built on the ``binaryFile`` source: file listing parallelizes,
    content loads lazily per task, and ``pathGlobFilter`` prunes at
    listing time (never reads non-matching files). Modality derives
    from the file extension — cheap and deterministic; callers needing
    sniffing run a magic-bytes pass with
    ``multimodal.binary_stats`` downstream.
    """
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    modality = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _MODALITY_BY_EXT.items() for x in kv]
        ),
        ext,
    )
    return df.select(
        F.xxhash64(F.col("path")).alias("asset_id"),
        F.col("path").alias("uri"),
        F.coalesce(modality, F.lit("blob")).alias("modality"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
    )


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


def table_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on whatever filesystem backs it
    (local, HDFS, object store) — resolved through the Hadoop
    FileSystem API so URI schemes work the same on a cluster as on
    local[n]. Sinks that incrementally maintain a persisted table
    (SCD2 upsert, sketch merge) use this to distinguish "first batch,
    nothing persisted yet" from a transient read failure: swallowing
    the latter under a bare except would silently re-initialize the
    table and discard all prior state."""
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return bool(fs.exists(p))
