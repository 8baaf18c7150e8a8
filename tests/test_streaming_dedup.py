"""Streaming MinHash-LSH dedup: candidates over a two-batch document
stream must equal the batch self-join candidates, including pairs
that span the batch boundary."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafkastreamer_spark.streaming.dedup import (
    band_signature_stream,
    streaming_minhash_candidates,
)
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table


def _batch_candidates(docs):
    sigs = band_signature_stream(docs).persist()
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def test_streaming_candidates_match_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    want = sorted(map(tuple, _batch_candidates(docs).collect()))
    assert want, "fixture should contain near-dup candidates"

    # stream the same docs in two files → two micro-batches; planted
    # duplicate pairs land in different halves (odd/even split keeps
    # consecutive-id dup pairs apart)
    inp = str(tmp_path / "in")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(inp)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(inp)

    stream = file_source(
        spark, inp, docs.schema, max_files_per_trigger=1
    )
    out = str(tmp_path / "out")
    cand = streaming_minhash_candidates(stream)

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        cand.writeStream.foreachBatch(wb)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = set()
    for b in sorted(os.listdir(out)):
        for r in spark.read.parquet(os.path.join(out, b)).collect():
            got.add((r["doc_a"], r["doc_b"]))
    assert sorted(got) == want

    # cross-batch coverage: at least one candidate pair spans the
    # even/odd split (one id even, one odd)
    assert any((a % 2) != (b % 2) for a, b in got)


def test_streaming_cms_sink_matches_batch(spark, sf_dir, tmp_path):
    """A CMS maintained incrementally over a two-batch stream must
    equal the sketch built on the full data in one pass (cell-wise
    mergeability carried into the streaming sink)."""
    import os

    from kafkastreamer_spark.streaming.sketches import cms_cells, cms_merge_sink

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    want = {
        (r.d, r.bucket): r.cell for r in cms_cells(ev, "user_id").collect()
    }

    inp = str(tmp_path / "in")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(inp)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(inp)

    stream = file_source(spark, inp, ev.schema, max_files_per_trigger=1)
    base = str(tmp_path / "cms_base")
    q = cms_merge_sink(stream, base, str(tmp_path / "ckpt_cms"), "user_id")
    q.awaitTermination(180)

    from kafkastreamer_spark.streaming import statedir

    got = {
        (r.d, r.bucket): r.cell
        for r in statedir.read_state(spark, base).collect()
    }
    assert got == want


def test_streaming_quality_gate_matches_batch_flags(spark, sf_dir, tmp_path):
    """The map-only repetition flag must (a) agree bit-for-bit with
    the shuffle-based metrics query on every document and (b) run as
    a plain stateless filter on a stream (no aggregation state)."""
    import os

    from kafkastreamer_spark.operators.quality import (
        repetition_metrics_df,
        with_repetition_flag,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expr_flags = {
        r.doc_id: r.flag
        for r in with_repetition_flag(docs).select("doc_id", "flag").collect()
    }
    agg_flags = {
        r.doc_id: r.flagged_repetitive
        for r in repetition_metrics_df(spark, sf_dir)
        .select("doc_id", "flagged_repetitive")
        .collect()
    }
    assert expr_flags == agg_flags

    inp = str(tmp_path / "qin")
    docs.coalesce(1).write.mode("append").parquet(inp)
    stream = file_source(spark, inp, docs.schema, max_files_per_trigger=1)
    gated = with_repetition_flag(stream).select("doc_id", "flag").filter(
        F.col("flag") == 0
    )
    out = str(tmp_path / "qout")

    def wb(bdf, bid):
        bdf.write.mode("append").parquet(out)

    q = (
        gated.writeStream.foreachBatch(wb)
        .option("checkpointLocation", str(tmp_path / "qckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {d for d, fl in agg_flags.items() if fl == 0}
    assert len(kept) < len(agg_flags)  # gate actually dropped docs


def test_streaming_rate_limit_matches_batch_quota(spark, sf_dir, tmp_path):
    """The stateful streaming rate limiter must reproduce the batch
    weekly-quota admitted/throttled totals when events arrive in
    (ts, event_id) order per key — quota state carries across
    micro-batch boundaries."""
    import os

    from kafkastreamer_spark.queries.governance import RATE_LIMIT
    from kafkastreamer_spark.registry import REGISTRY
    from kafkastreamer_spark.streaming.sketches import rate_limit_stateful

    want = {
        r.user_id: (r.admitted, r.throttled)
        for r in REGISTRY["events_rate_limit_quota"].fn(spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    inp = str(tmp_path / "rin")
    for half in (
        ev.filter(F.col("event_id") <= mid),
        ev.filter(F.col("event_id") > mid),
    ):
        half.orderBy("ts", "event_id").coalesce(1).write.mode("append").parquet(inp)

    stream = file_source(spark, inp, ev.schema, max_files_per_trigger=1)
    limited = rate_limit_stateful(stream, "user_id", "ts", RATE_LIMIT)
    out = str(tmp_path / "rout")

    def wb(bdf, bid):
        bdf.write.mode("append").parquet(out)

    q = (
        limited.writeStream.foreachBatch(wb)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "rckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got: dict = {}
    for r in spark.read.parquet(out).collect():
        a, t = got.get(r.user_id, (0, 0))
        got[r.user_id] = (a + r.admitted, t + r.throttled)
    assert got == want


def test_streaming_quota_sample_matches_batch(spark, sf_dir, tmp_path):
    """The streaming head-sampler must admit exactly the batch
    row_number()<=N head sample (same ids, same ranks) when rows
    arrive ordered per key, with the admitted count carried across
    micro-batch boundaries."""
    from kafkastreamer_spark.queries.events2 import QUOTA_N
    from kafkastreamer_spark.registry import REGISTRY
    from kafkastreamer_spark.streaming.sketches import quota_sample_stateful

    want = {
        (r.user_id, r.event_id, r.rk)
        for r in REGISTRY["events_quota_sample"].fn(spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    inp = str(tmp_path / "qin")
    for half in (
        ev.filter(F.col("event_id") <= mid),
        ev.filter(F.col("event_id") > mid),
    ):
        half.orderBy("ts", "event_id").coalesce(1).write.mode("append").parquet(inp)

    stream = file_source(spark, inp, ev.schema, max_files_per_trigger=1)
    sampled = quota_sample_stateful(stream, "user_id", "event_id", QUOTA_N)
    out = str(tmp_path / "qout")

    def wb(bdf, bid):
        bdf.write.mode("append").parquet(out)

    q = (
        sampled.writeStream.foreachBatch(wb)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "qckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.event_id, r.rk) for r in spark.read.parquet(out).collect()
    }
    assert got == want


def test_streaming_kll_sink_within_rank_error(spark, sf_dir, tmp_path):
    """A KLL sketch maintained incrementally over a two-batch stream
    must answer quantiles within the k=200 sketch's rank error of the
    exactly-sorted data (KLL merge state is randomized, so the
    contract is the rank-error bound, not cell equality like CMS)."""
    import os

    from kafkastreamer_spark.streaming.sketches import kll_merge_sink

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    vals = sorted(r["value"] for r in ev.select("value").collect())

    inp = str(tmp_path / "kin")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    stream = file_source(spark, inp, ev.schema, max_files_per_trigger=1)
    base = str(tmp_path / "kll_base")
    q = kll_merge_sink(stream, base, str(tmp_path / "ckpt_kll"), "value")
    q.awaitTermination(180)

    from kafkastreamer_spark.streaming import statedir

    sk = statedir.read_state(spark, base)
    row = sk.select(
        F.kll_sketch_get_n_double("sk").alias("n"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("q50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.95)).alias("q95"),
    ).collect()[0]
    assert row["n"] == len(vals)
    for p, v in ((0.5, row["q50"]), (0.95, row["q95"])):
        true_rank = sum(1 for x in vals if x <= v) / len(vals)
        assert abs(true_rank - p) <= 0.03, (p, v, true_rank)


def test_streaming_hll_sink_within_error_bound(spark, sf_dir, tmp_path):
    """An HLL maintained incrementally over a two-batch stream (with a
    post-flip crash + replay in between) must estimate the true
    distinct count within the sketch's standard error, and the replay
    must not inflate it (applied-batch skip + HLL union idempotence)."""
    from kafkastreamer_spark.streaming import statedir
    from kafkastreamer_spark.streaming.sketches import hll_merge_sink

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    truth = ev.select("user_id").distinct().count()

    inp = str(tmp_path / "hin")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(inp)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(inp)

    base, ckpt = str(tmp_path / "hll_base"), str(tmp_path / "ckpt_hll")

    class Boom(Exception):
        pass

    def crash_on_1(batch_id):
        if batch_id == 1:
            raise Boom("injected")

    import pytest as _pytest

    stream = file_source(spark, inp, ev.schema, max_files_per_trigger=1)
    q = hll_merge_sink(stream, base, ckpt, "user_id", post_publish_hook=crash_on_1)
    with _pytest.raises(Exception):  # noqa: PT011
        q.awaitTermination(180)
    assert statedir.applied_batch(base) == 1  # flip landed pre-crash

    stream = file_source(spark, inp, ev.schema, max_files_per_trigger=1)
    q = hll_merge_sink(stream, base, ckpt, "user_id")
    q.awaitTermination(180)

    est = (
        statedir.read_state(spark, base)
        .select(F.hll_sketch_estimate("sk").alias("n"))
        .collect()[0]["n"]
    )
    # lgConfigK=12 default -> relative error ~1.04/sqrt(4096) ~ 1.6%;
    # assert within 5% for slack
    assert abs(est - truth) <= max(3, 0.05 * truth)


def test_repetition_flag_degenerate_docs(spark):
    """Round-7 run-length rework edge pin: degenerate docs must not
    crash (the unguarded sequence(0, size-2) DESCENDED on a 1-token
    doc and indexed _toks[-1]) and must flag DETERMINISTICALLY. The
    thresholds themselves flag any sub-10-token doc (10*top_bigram >
    n holds whenever a bigram exists and n <= 9; n <= 2 makes the
    trigram clause vacuously true) — pinned here so a threshold
    change shows up as a semantic diff, not silence."""
    from kafkastreamer_spark.operators.quality import with_repetition_flag

    d = spark.createDataFrame(
        [
            (1, "single"),
            (2, "two tokens"),
            (3, "a a a a a a a a a a"),
            (4, "eleven distinct words all different from each other entirely here"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.flag for r in with_repetition_flag(d).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 0}
