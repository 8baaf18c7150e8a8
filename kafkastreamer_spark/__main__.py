"""CLI: run a reference-style topology on the Spark engine.

The reference's workflow is `KafkaParser.py -F topology.xml` → bash
scripts → hand-started JVMs (SURVEY.md §3 EP1). The engine's is one
command:

    python -m kafkastreamer_spark --topology topology.xml \
        --mode single|chained --records 1000 --out /tmp/out

`single` compiles the whole topology into one query (default, no
intermediate hops); `chained` reproduces the reference's
stage-per-query deployment with directory channels (Kafka channels in
production via --bootstrap); `dag` runs a fan-out/fan-in topology
JSON (plans/dag.py nodes/sinks format — a shape the reference cannot
express) through the single-query compiler, one result directory per
sink; `corpus` runs a corpus-hygiene topology
(plans/corpus_pipeline.py vocabulary: repetition_gate / exact_dedup /
source_cap / temperature_mix) over a documents parquet dir given via
--input, writing the surviving documents. `corpus --stream` runs the
SAME declared topology as a Structured Streaming job instead: the
input dir becomes a file source (one file per micro-batch), the
topology is compiled in streaming mode (batch-only stages and the
TTL-less exact_dedup are rejected at compile time), and survivors
land through the batchId-idempotent exactly-once parquet sink —
stream survivors equal the batch run's for the stateless-gate
vocabulary (tested). `corpus-dag` runs a FAN-OUT/FAN-IN corpus
topology JSON (plans/corpus_dag.py: dag.py's nodes/sinks format with
the corpus stage vocabulary; every source node binds to the --input
documents dir) — batch by default, `--stream` for the single-query-
per-sink Structured Streaming deployment with the same compile-time
rejections (stream==batch survivors tested on a 2-branch DAG).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kafkastreamer_spark")
    ap.add_argument("--topology", required=True, help="topology XML (reference format) or JSON")
    ap.add_argument(
        "--mode",
        choices=["single", "chained", "dag", "corpus", "corpus-dag"],
        default="single",
    )
    ap.add_argument("--records", type=int, default=1000, help="bounded source size")
    ap.add_argument(
        "--input",
        default="",
        help="documents parquet dir (corpus mode; default: the sf0.001 fixture)",
    )
    ap.add_argument("--out", default="", help="output directory (default: temp)")
    ap.add_argument(
        "--stream",
        action="store_true",
        help="corpus mode: run the topology as a streaming job over the "
        "input dir (one file per micro-batch, exactly-once sink)",
    )
    ap.add_argument("--bootstrap", default="", help="Kafka bootstrap (chained mode)")
    ap.add_argument("--show", type=int, default=10, help="rows to print")
    args = ap.parse_args(argv)

    from kafkastreamer_spark.plans.pipeline import (
        compile_pipeline,
        from_dict,
        parse_topology_xml,
    )
    from kafkastreamer_spark.session import get_spark
    from kafkastreamer_spark.streaming.sources import keyed_int_batch

    from kafkastreamer_spark.plans.pipeline import TopologyError

    try:
        if args.mode == "dag":
            from kafkastreamer_spark.plans.dag import from_dict as dag_from_dict

            with open(args.topology) as fh:
                dag_spec = dag_from_dict(json.load(fh))
            spec = None
        elif args.mode == "corpus-dag":
            from kafkastreamer_spark.plans.corpus_dag import (
                corpus_dag_from_dict,
            )

            with open(args.topology) as fh:
                dag_spec = corpus_dag_from_dict(
                    json.load(fh), streaming=args.stream
                )
            spec = None
        elif args.mode == "corpus":
            from kafkastreamer_spark.plans.corpus_pipeline import (
                corpus_spec_from_dict,
                parse_corpus_topology_xml,
            )

            if args.topology.endswith(".json"):
                with open(args.topology) as fh:
                    spec = corpus_spec_from_dict(json.load(fh))
            else:
                spec = parse_corpus_topology_xml(args.topology)
        elif args.topology.endswith(".json"):
            with open(args.topology) as fh:
                spec = from_dict(json.load(fh))
        else:
            spec = parse_topology_xml(args.topology)
    except (TopologyError, ValueError, OSError) as exc:
        # ValueError covers json.JSONDecodeError (malformed JSON, or an
        # XML file passed with --mode dag); OSError covers a missing/
        # unreadable file — all land on the clean exit-2 path.
        print(f"error: invalid topology: {exc}", file=sys.stderr)
        return 2

    stream_id = (
        (dag_spec.stream_id or args.mode)
        if args.mode in ("dag", "corpus-dag")
        else spec.stream_id
    )
    from pyspark.sql import SparkSession

    # only stop the session if this CLI call created it — embedding
    # callers (tests, notebooks) keep theirs
    _owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name=f"kafkastreamer-{stream_id}")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = args.out or tempfile.mkdtemp(prefix=f"ks_{stream_id}_")

    if args.mode == "dag":
        from kafkastreamer_spark.plans.dag import SOURCE_OP, compile_dag

        src_names = [n.name for n in dag_spec.nodes if n.operation == SOURCE_OP]
        sources = {
            name: keyed_int_batch(spark, args.records, 2).withColumn(
                "value", F.col("value").cast("long")
            )
            for name in src_names
        }
        results = compile_dag(dag_spec)(sources)
        for sink, df in results.items():
            df.write.mode("overwrite").parquet(os.path.join(out_dir, sink))
            print(f"-- sink {sink}:")
            df.orderBy(F.col("value")).show(args.show, truncate=False)
        print(
            f"stream_id={stream_id} nodes={len(dag_spec.nodes)} "
            f"sinks={len(results)} out={out_dir}"
        )
        if _owns_session:
            spark.stop()
        return 0

    if args.mode == "corpus-dag":
        from kafkastreamer_spark.plans.corpus_dag import compile_corpus_dag
        from kafkastreamer_spark.plans.dag import SOURCE_OP
        from kafkastreamer_spark.tables import widen

        in_dir = args.input or "/root/testdata/sf0.001/documents.parquet"
        src_names = [
            n.name for n in dag_spec.nodes if n.operation == SOURCE_OP
        ]
        if args.stream:
            from kafkastreamer_spark.streaming.core import (
                exactly_once_parquet_sink,
            )
            from kafkastreamer_spark.streaming.sources import file_source

            schema = spark.read.parquet(in_dir).schema
            sources = {
                name: file_source(
                    spark, in_dir, schema, max_files_per_trigger=1
                )
                for name in src_names
            }
            results = compile_corpus_dag(dag_spec, streaming=True)(sources)
            for sink, df in results.items():
                q = exactly_once_parquet_sink(
                    df,
                    os.path.join(out_dir, sink),
                    os.path.join(out_dir, f"_checkpoint_{sink}"),
                )
                q.awaitTermination()
            n_in = spark.read.parquet(in_dir).count()
            counts = {
                sink: spark.read.parquet(os.path.join(out_dir, sink)).count()
                for sink in results
            }
            print(
                f"stream_id={stream_id} nodes={len(dag_spec.nodes)} "
                f"mode=streaming docs_in={n_in} "
                + " ".join(f"{s}={c}" for s, c in counts.items())
                + f" out={out_dir}"
            )
            if _owns_session:
                spark.stop()
            return 0
        docs = widen(spark.read.parquet(in_dir))
        results = compile_corpus_dag(dag_spec)({n: docs for n in src_names})
        n_in = docs.count()
        counts = {}
        for sink, df in results.items():
            df.write.mode("overwrite").parquet(os.path.join(out_dir, sink))
            counts[sink] = spark.read.parquet(
                os.path.join(out_dir, sink)
            ).count()
        print(
            f"stream_id={stream_id} nodes={len(dag_spec.nodes)} "
            f"docs_in={n_in} "
            + " ".join(f"{s}={c}" for s, c in counts.items())
            + f" out={out_dir}"
        )
        if _owns_session:
            spark.stop()
        return 0

    if args.mode == "corpus":
        from kafkastreamer_spark.plans.corpus_pipeline import (
            compile_corpus_pipeline,
        )
        from kafkastreamer_spark.tables import widen

        in_dir = args.input or "/root/testdata/sf0.001/documents.parquet"
        if args.stream:
            from kafkastreamer_spark.streaming.core import (
                exactly_once_parquet_sink,
            )
            from kafkastreamer_spark.streaming.sources import file_source

            schema = spark.read.parquet(in_dir).schema
            stream = file_source(spark, in_dir, schema, max_files_per_trigger=1)
            try:
                survivors = compile_corpus_pipeline(spec, streaming=True)(
                    stream
                )
            except TopologyError as exc:
                print(f"error: invalid topology: {exc}", file=sys.stderr)
                if _owns_session:
                    spark.stop()
                return 2
            sink_dir = os.path.join(out_dir, "survivors")
            q = exactly_once_parquet_sink(
                survivors, sink_dir, os.path.join(out_dir, "_checkpoint")
            )
            q.awaitTermination()
            n_in = spark.read.parquet(in_dir).count()
            n_out = spark.read.parquet(sink_dir).count()
            print(
                f"stream_id={spec.stream_id} stages={len(spec.stages)} "
                f"mode=streaming docs_in={n_in} docs_out={n_out} "
                f"out={out_dir}"
            )
            if _owns_session:
                spark.stop()
            return 0
        docs = widen(spark.read.parquet(in_dir))
        survivors = compile_corpus_pipeline(spec)(docs)
        survivors.write.mode("overwrite").parquet(os.path.join(out_dir, "survivors"))
        n_in = docs.count()
        n_out = spark.read.parquet(os.path.join(out_dir, "survivors")).count()
        print(
            f"stream_id={spec.stream_id} stages={len(spec.stages)} "
            f"docs_in={n_in} docs_out={n_out} out={out_dir}"
        )
        if _owns_session:
            spark.stop()
        return 0

    if args.mode == "single":
        src = keyed_int_batch(spark, args.records, spec.partitions).withColumn(
            "value", F.col("value").cast("long")
        )
        result = compile_pipeline(spec)(src)
        result.write.mode("overwrite").parquet(os.path.join(out_dir, "result"))
        result.orderBy(F.col("value")).show(args.show, truncate=False)
    else:
        from kafkastreamer_spark.plans.topology_mode import (
            DirChannels,
            KafkaChannels,
            run_topology_available_now,
        )

        if args.bootstrap:
            channels = KafkaChannels(args.bootstrap, spec.stream_id)
        else:
            channels = DirChannels(os.path.join(out_dir, "channels"), spec.stream_id)
            keyed_int_batch(spark, args.records, spec.partitions).write.mode(
                "append"
            ).parquet(channels.path(0))
        run_topology_available_now(
            spark, spec, channels, os.path.join(out_dir, "ckpt")
        )
        if not args.bootstrap:
            final = spark.read.parquet(channels.path(len(spec.stages)))
            final.orderBy(F.col("value").cast("long")).show(args.show, truncate=False)

    print(f"stream_id={stream_id} stages={len(spec.stages)} out={out_dir}")
    if _owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
