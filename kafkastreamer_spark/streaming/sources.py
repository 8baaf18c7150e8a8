"""Streaming source adapters (SURVEY.md §2-A A1/A2).

The reference has two sources: a synthetic keyed-integer generator
(Producer.java:72-90 — key = "Key" + (i % partitions), value = str(i))
and a Kafka stage-topic consumer with read-committed isolation
(Streamer.java:113-120,151-156). Both map to Structured Streaming
sources producing the engine's canonical stream schema
``(key string, value string)``; event-time extensions add ``ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def keyed_int_stream(df: DataFrame, partitions: int) -> DataFrame:
    """Shape any DataFrame with a monotonically increasing ``value``
    long column (rate source, spark.range) into the reference
    source's record shape (Producer.java:74-75)."""
    return df.select(
        F.concat(F.lit("Key"), (F.col("value") % partitions).cast("string")).alias("key"),
        F.col("value").cast("string").alias("value"),
    )


def rate_source(
    spark: SparkSession, rows_per_second: int = 1000, partitions: int = 2
) -> DataFrame:
    """Reference A1 as a rate stream: unbounded keyed integers.

    The reference throttles with Thread.sleep (Producer.java:86);
    rowsPerSecond is the declarative equivalent.
    """
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return keyed_int_stream(raw, partitions)


def keyed_int_batch(spark: SparkSession, n: int, partitions: int = 2) -> DataFrame:
    """Bounded batch fixture with identical semantics (spark.range),
    for golden tests: record i → (Key<i%P>, str(i))."""
    return keyed_int_stream(spark.range(n).select(F.col("id").alias("value")), partitions)


def kafka_consumer_options(
    bootstrap: str,
    topic: str,
    starting_offsets: str = "earliest",
    read_committed: bool = True,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The consumer option map, as a pure function so the broker-less
    sandbox can still assert reference parity (Streamer.java:113-120:
    earliest reset at :119, read_committed isolation at :118) — see
    docs/kafka_smoke_blocker.md for why no broker-backed test exists."""
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if read_committed:
        opts["kafka.isolation.level"] = "read_committed"
    if max_offsets_per_trigger is not None:
        # backpressure: cap records per micro-batch (reference maps
        # its sleep-throttle here, SURVEY.md §4.2)
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_source(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "earliest",
    read_committed: bool = True,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Reference A2: subscribe to a stage topic.

    Matches the reference consumer's settings — earliest reset
    (Streamer.java:119) and read_committed isolation
    (Streamer.java:118). Kafka source parallelism = topic partitions,
    exactly as the reference maps one worker per partition.
    """
    raw = (
        spark.readStream.format("kafka")
        .options(
            **kafka_consumer_options(
                bootstrap,
                topic,
                starting_offsets,
                read_committed,
                max_offsets_per_trigger,
            )
        )
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("ts"),
    )


def file_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-drop stream source (used by the deterministic tests; also
    the standard pattern for landing-zone ingestion at scale).

    ``max_files_per_trigger`` is the backpressure knob — the
    declarative replacement for the reference's sleep-per-record
    throttling (Streamer.java:470; SURVEY.md §4.2): bound work per
    micro-batch instead of slowing the worker.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


# ---------------------------------------------------------------------------
# Reference A1 as a registered custom Python data source (Spark 4
# DataSource API): spark.read.format("keyed_int") /
# spark.readStream.format("keyed_int") after register_keyed_int_source.
# ---------------------------------------------------------------------------


def register_keyed_int_source(spark: SparkSession) -> None:
    """Register the reference's synthetic keyed-int generator
    (Producer.java:72-90: record i → key "Key"+(i%partitions),
    value str(i), numMessages bound at Producer.java:14) as a custom
    Python data source named ``keyed_int``, usable as BOTH a batch
    source and a streaming source:

        spark.read.format("keyed_int").option("n", 100000).load()
        spark.readStream.format("keyed_int")
             .option("n", 100000).option("rows_per_batch", 1000).load()

    Batch splits the id range into ``tasks`` partitions (parallel,
    deterministic). Streaming implements a SimpleDataSourceStreamReader
    whose offset is the next id — exactly the reference's "offset =
    message index" contract — so checkpoint recovery resumes mid-range
    without duplicates, and ``rows_per_batch`` is the declarative
    replacement for the producer's per-record sleep throttle
    (Producer.java:86).

    Defined inside the function: DataSource subclasses are pickled to
    Python workers, and a module-level class in the engine package
    would drag the whole package into every worker pickle.
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 100_000))
            self.p = int(options.get("partitions", 2))
            self.tasks = int(options.get("tasks", 8))

        def partitions(self):
            step = -(-self.n // self.tasks) or 1
            return [
                InputPartition((lo, min(lo + step, self.n)))
                for lo in range(0, self.n, step)
            ]

        def read(self, part):
            lo, hi = part.value
            for i in range(lo, hi):
                yield (f"Key{i % self.p}", str(i))

    class _StreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.n = int(options.get("n", 100_000))
            self.p = int(options.get("partitions", 2))
            self.per_batch = int(options.get("rows_per_batch", 1000))

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            lo = start["i"]
            hi = min(lo + self.per_batch, self.n)
            rows = [(f"Key{i % self.p}", str(i)) for i in range(lo, hi)]
            return iter(rows), {"i": hi}

        def readBetweenOffsets(self, start, end):
            return iter(
                [(f"Key{i % self.p}", str(i)) for i in range(start["i"], end["i"])]
            )

    class KeyedIntSource(DataSource):
        @classmethod
        def name(cls):
            return "keyed_int"

        def schema(self):
            return "key string, value string"

        def reader(self, schema):
            return _Reader(self.options)

        def simpleStreamReader(self, schema):
            return _StreamReader(self.options)

    spark.dataSource.register(KeyedIntSource)


def register_keyval_text_sink(spark: SparkSession) -> None:
    """Register the sink half of the custom-datasource surface: a
    ``keyval_text`` Python data source whose WRITER lands records as
    ``key=value`` text lines — the reference's wire format, its
    URL-encoded ``k=v`` state serialization (Streamer.java:552-591),
    as a Spark 4 DataSource writer with the full task-commit protocol:

    * each task writes its partition to a uniquely-named part file and
      returns the name in its WriterCommitMessage;
    * ``commit`` finalizes by writing a ``_MANIFEST`` listing exactly
      the committed files (readers ignore uncommitted stragglers) —
      batch writes one manifest, streaming one per micro-batch
      (``_MANIFEST.<batchId>``), which is what makes a replayed batch
      idempotent at the manifest level;
    * ``abort`` removes the orphaned part files.

    Usable as both ``df.write.format("keyval_text")`` and
    ``df.writeStream.format("keyval_text")`` after registration.
    Defined inside the function for the same pickling reason as
    register_keyed_int_source.
    """
    import os
    import uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Msg(WriterCommitMessage):
        def __init__(self, filename: str, n_rows: int):
            self.filename = filename
            self.n_rows = n_rows

    def _write_partition(path: str, it) -> _Msg:
        os.makedirs(path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.kv"
        n = 0
        with open(os.path.join(path, name), "w") as f:
            for row in it:
                k, v = str(row["key"]), str(row["value"])
                # Wire-format contract (enforced, not silently corrupted):
                # the reader splits each line at its FIRST '=', so '=' is
                # legal in values but not keys; newlines are the record
                # separator so legal in neither.
                if "=" in k:
                    raise ValueError(f"keyval_text: '=' not allowed in key: {k!r}")
                if "\n" in k or "\r" in k or "\n" in v or "\r" in v:
                    raise ValueError("keyval_text: newline not allowed in key/value")
                f.write(f"{k}={v}\n")
                n += 1
        return _Msg(name, n)

    class _Writer(DataSourceWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, it):
            return _write_partition(self.path, it)

        def commit(self, messages):
            with open(os.path.join(self.path, "_MANIFEST"), "w") as f:
                for m in messages:
                    f.write(f"{m.filename}\t{m.n_rows}\n")

        def abort(self, messages):
            for m in messages:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass

    class _StreamWriter(DataSourceStreamWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, it):
            return _write_partition(self.path, it)

        def commit(self, messages, batchId):
            with open(os.path.join(self.path, f"_MANIFEST.{batchId}"), "w") as f:
                for m in messages:
                    f.write(f"{m.filename}\t{m.n_rows}\n")

        def abort(self, messages, batchId):
            for m in messages:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass

    class KeyValTextSink(DataSource):
        @classmethod
        def name(cls):
            return "keyval_text"

        def writer(self, schema, overwrite):
            return _Writer(self.options)

        def streamWriter(self, schema, overwrite):
            return _StreamWriter(self.options)

    spark.dataSource.register(KeyValTextSink)


def read_keyval_text(spark: SparkSession, path: str) -> DataFrame:
    """Read back a keyval_text directory through its manifests: only
    files named in a ``_MANIFEST*`` are visible — uncommitted/aborted
    part files are invisible, which is the sink's atomicity contract."""
    import glob as _glob
    import os

    files: list[str] = []
    for manifest in sorted(_glob.glob(os.path.join(path, "_MANIFEST*"))):
        with open(manifest) as f:
            for line in f:
                files.append(os.path.join(path, line.split("\t")[0]))
    if not files:
        return spark.createDataFrame([], "key string, value string")
    df = spark.read.text(files)
    # Split at the FIRST '=' only: keys may not contain '=' (writer
    # enforces), values may — 'k=a=b' must round-trip as ('k', 'a=b').
    return df.select(
        F.split_part("value", F.lit("="), F.lit(1)).alias("key"),
        F.expr("substring(value, instr(value, '=') + 1)").alias("value"),
    )
