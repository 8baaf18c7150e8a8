"""Capstone composition: training-corpus selection.

The point of the operator library is that the pieces compose into the
actual LLM-data pipeline: score quality → drop near-duplicates (keep
one representative per cluster) → select. This module registers that
end-to-end pipeline as one oracle-checked query — filter, scoring,
candidate generation, connected components, and anti-join all in a
single Catalyst plan (plus the iterative CC rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.operators.dedup import (
    _cluster_oracle,
    dedup_cluster_representatives,
)
from kafkastreamer_spark.operators.text import text_quality_score
from kafkastreamer_spark.registry import REGISTRY, register

MIN_QUALITY = 70


def _corpus_oracle() -> str:
    quality = REGISTRY["text_quality_score"].oracle.replace("ORDER BY doc_id", "")
    # the cluster oracle is a full WITH RECURSIVE query; embed its
    # CTE chain and re-head the final SELECT as a CTE.
    cluster = _cluster_oracle()
    cluster_body = cluster[cluster.index("WITH RECURSIVE") + len("WITH RECURSIVE") :]
    final_select = "SELECT src AS doc_id, LEAST(src, MIN(dst)) AS rep_id"
    cluster_ctes = cluster_body[: cluster_body.index(final_select)].rstrip().rstrip(",")
    return f"""
        WITH RECURSIVE {cluster_ctes},
        reps AS (
            SELECT src AS doc_id, LEAST(src, MIN(dst)) AS rep_id
            FROM reach GROUP BY src
        ),
        quality AS ({quality})
        SELECT q.doc_id, q.lang, q.quality_score
        FROM quality q
        LEFT JOIN reps r ON r.doc_id = q.doc_id
        WHERE q.quality_score >= {MIN_QUALITY}
          AND (r.rep_id IS NULL OR r.rep_id = q.doc_id)
        ORDER BY q.doc_id
    """


@register(
    "pipeline_training_corpus",
    oracle=_corpus_oracle(),
    tags=("llm-data", "pipeline", "dedup", "text"),
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus selection: quality_score ≥ 70 AND (not in a
    near-dup cluster OR the cluster's representative).

    Composes three registered operators (quality scoring, Jaccard
    near-dup pairs, connected-components consolidation) into one
    output — the engine's operators are DataFrames, so composition is
    just more plan."""
    quality = text_quality_score(spark, sf_dir).select(
        "doc_id", "lang", "quality_score"
    )
    reps = dedup_cluster_representatives(spark, sf_dir)
    keep = quality.filter(F.col("quality_score") >= MIN_QUALITY)
    return (
        keep.join(reps, "doc_id", "left")
        .filter(F.col("rep_id").isNull() | (F.col("rep_id") == F.col("doc_id")))
        .select("doc_id", "lang", "quality_score")
        .orderBy("doc_id")
    )
