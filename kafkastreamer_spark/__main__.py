"""CLI: run a reference-style topology on the Spark engine.

The reference's workflow is `KafkaParser.py -F topology.xml` → bash
scripts → hand-started JVMs (SURVEY.md §3 EP1). The engine's is one
command:

    python -m kafkastreamer_spark --topology topology.xml \
        --mode single|chained --records 1000 --out /tmp/out

`single` compiles the whole topology into one query (default, no
intermediate hops); `chained` reproduces the reference's
stage-per-query deployment with directory channels (Kafka channels in
production via --bootstrap).
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
    ap.add_argument("--mode", choices=["single", "chained"], default="single")
    ap.add_argument("--records", type=int, default=1000, help="bounded source size")
    ap.add_argument("--out", default="", help="output directory (default: temp)")
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
        if args.topology.endswith(".json"):
            with open(args.topology) as fh:
                spec = from_dict(json.load(fh))
        else:
            spec = parse_topology_xml(args.topology)
    except TopologyError as exc:
        print(f"error: invalid topology: {exc}", file=sys.stderr)
        return 2

    spark = get_spark(app_name=f"kafkastreamer-{spec.stream_id}")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = args.out or tempfile.mkdtemp(prefix=f"ks_{spec.stream_id}_")

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

    print(f"stream_id={spec.stream_id} stages={len(spec.stages)} out={out_dir}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
