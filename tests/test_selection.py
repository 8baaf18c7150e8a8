"""Plan-shape and semantic assertions for the data-selection
operators (operators/selection.py): DSIR importance scoring, SemDeDup
cluster-blocked dedup, the threshold sweep, and the LM fluency gate.
Oracle parity itself is covered by test_oracle_queries.py; these pin
the properties the oracles can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamer_spark.operators.selection import (
    DSIR_BUCKETS,
    DSIR_TARGET_LANG,
    _cluster_assign,
)
from kafkastreamer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dsir_weight_table_broadcasts(spark, sf_dir):
    """The bucket-weight table is DSIR_BUCKETS rows at any corpus
    size; its join onto the per-doc feature relation must broadcast —
    a shuffled weights join would partition the corpus by bucket id
    (128 partitions max → parallelism collapse at scale)."""
    df = REGISTRY["text_dsir_importance"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan


def test_dsir_weights_sum_structure(spark, sf_dir):
    """Every score decomposes over at most DSIR_BUCKETS buckets, and
    a pure-target-language corpus slice must lean positive: the
    top-scored document is a target-language one on the fixture."""
    rows = REGISTRY["text_dsir_importance"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    assert all(r.n_feats > 0 for r in rows)
    assert rows[0].lang == DSIR_TARGET_LANG
    # scores are per-feature ppm averages — bounded by the max bucket
    # weight (1e6 in the degenerate all-target case)
    assert all(abs(r.score_avg_ppm) <= 1_000_000 for r in rows)
    assert DSIR_BUCKETS >= 2


def test_semdedup_pair_join_is_cluster_blocked(spark, sf_dir):
    """The pair join must key on cent_id (a partitioned equi join) —
    never an unkeyed product over all vector pairs. The only
    nested-loop allowed is the assignment's vectors-x-broadcast-
    centroids argmax (the IVF pattern: the centroid side is ~sqrt(n)
    rows and explicitly broadcast)."""
    df = REGISTRY["dedup_semdedup_clustered"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan
    import re

    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\s*\[?cent_id", plan)
    # every nested-loop in the plan is a broadcast of the tiny
    # centroid relation, not a corpus-x-corpus product
    assert plan.count("BroadcastNestedLoopJoin") == plan.count(
        "BroadcastNestedLoopJoin BuildRight, Cross"
    )


def test_semdedup_assignment_is_total(spark, sf_dir):
    """Every vector lands in exactly one cluster, and every reported
    kept/dropped pair shares that cluster."""
    assign = _cluster_assign(spark, "/root/testdata/sf0.001")
    n_vec = assign.count()
    assert assign.select("vec_id").distinct().count() == n_vec
    pairs = REGISTRY["dedup_semdedup_clustered"].fn(spark, "/root/testdata/sf0.001")
    joined = (
        pairs.join(
            assign.select(F.col("vec_id").alias("vec_dropped"), "cent_id").withColumnRenamed(
                "cent_id", "cent_of_dropped"
            ),
            "vec_dropped",
        )
        .filter(F.col("cent_id") != F.col("cent_of_dropped"))
        .count()
    )
    assert joined == 0


def test_threshold_sweep_cumulative_is_monotone(spark, sf_dir):
    """n_pairs_ge must be non-increasing in the threshold (monotone
    cumulative from the top bin down) and end at the total pair
    count."""
    rows = REGISTRY["dedup_semdedup_threshold_sweep"].fn(spark, sf_dir).collect()
    assert rows, "fixture produces at least one within-cluster pair"
    by_bin_desc = sorted(rows, key=lambda r: -r.bin10)
    running = 0
    for r in by_bin_desc:
        running += r.n_pairs
        assert r.n_pairs_ge == running
    assert min(r.bin10 for r in rows) >= -10
    assert max(r.bin10 for r in rows) <= 10


def test_lm_fluency_histogram_partitions_scored_docs(spark, sf_dir):
    """Bucket counts must sum to the number of documents with at
    least one bigram (docs shorter than 2 tokens are unscoreable) and
    per-bucket min/max must respect the bucket edges."""
    rows = REGISTRY["text_lm_fluency_score"].fn(spark, sf_dir).collect()
    from kafkastreamer_spark.operators._embed import tokens
    from kafkastreamer_spark.tables import load_table

    scoreable = (
        load_table(spark, sf_dir, "documents")
        .select(F.size(tokens("text")).alias("n"))
        .filter(F.col("n") >= 2)
        .count()
    )
    assert sum(r.n_docs for r in rows) == scoreable
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert r.min_ppm <= r.max_ppm
        if r.bucket < 9:
            assert r.bucket == r.min_ppm // 100000 == r.max_ppm // 100000
