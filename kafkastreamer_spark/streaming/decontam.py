"""Streaming benchmark-decontamination gate — STATE-FREE.

The batch operator (``dedup_decontaminate``, operators/dedup.py:686)
joins the exploded train-doc shingles against the eval corpus's
distinct shingle set and aggregates per doc. A stream could do the
same with a stream-static join + aggregation, but that makes an
UNBOUNDED stateful operator out of a gate whose right side is tiny by
nature (benchmarks are a few MB of text against a 100 TB train
corpus). This twin instead broadcasts the eval shingle SET to the
executors and scores each arriving document map-side in one Arrow
batch pass: zero state, zero shuffle, append-mode friendly — the gate
can sit in front of any ingestion topology without changing its
checkpoint footprint.

Parity: the per-doc shingle array is built by the SAME Spark
expression the batch operator uses (``shingles(tokens(text))`` —
distinct word n-grams, empty under n words), so the only Python-side
work is set intersection against the broadcast set; there is no
tokenizer drift to diverge on. Docs with no shingles (< n words) are
never flagged, matching the batch form's ``len(w) >= 3`` guard.
contam4 is floor(overlap/shingles * 10000) — one IEEE division and
multiply, bit-identical across engines.

Reference parity note: the reference engine has no analog (keyed int
streamer, v1/src/main/java/Stream/Streamer.java); this is the
streaming closure of the SURVEY §2 Part-B decontamination row
(VERDICT r7 stretch #8).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import shingles, tokens

CONTAM_THRESHOLD = 0.2  # same flag threshold as the batch operator


def eval_shingle_set(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> set[str]:
    """Distinct word n-grams of the EVAL corpus, collected to the
    driver. Deliberately driver-side: eval benchmarks are small by
    construction (the batch operator's broadcast-join reasoning,
    operators/dedup.py:721-726); at 100 TB train scale this set is a
    few MB and rides to executors as one broadcast variable."""
    rows = (
        docs.select(F.explode(shingles(tokens(text_col), n)).alias("s"))
        .distinct()
        .collect()
    )
    return {r["s"] for r in rows}


def with_contamination(
    docs: DataFrame,
    eval_shingles: set[str],
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Append ``n_overlap``/``n_shingles``/``contam4`` columns to a
    (streaming or batch) document frame, map-side. The shingle array
    is built by the batch operator's own Spark expression; the Arrow
    pass only intersects it with the broadcast eval set."""
    from pyspark.sql.types import LongType, StructField, StructType

    bc = docs.sparkSession.sparkContext.broadcast(frozenset(eval_shingles))
    staged = docs.withColumn("_sh", shingles(tokens(text_col), n))
    # build a FRESH StructType: df.schema is cached on the DataFrame
    # and StructType.add mutates in place, which would silently grow
    # staged's own column list with the not-yet-existing output fields
    schema = StructType(
        list(staged.schema.fields)
        + [
            StructField("n_overlap", LongType()),
            StructField("n_shingles", LongType()),
            StructField("contam4", LongType()),
        ]
    )

    def score(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ev = bc.value
        for pdf in pdfs:
            shs = pdf["_sh"]
            n_sh, n_ov, c4 = [], [], []
            for arr in shs:
                k = len(arr)
                ov = sum(1 for s in arr if s in ev)
                n_sh.append(k)
                n_ov.append(ov)
                c4.append(math.floor(ov / k * 10000) if k else 0)
            out = pdf.copy()
            out["n_overlap"] = pd.Series(n_ov, dtype="int64", index=pdf.index)
            out["n_shingles"] = pd.Series(n_sh, dtype="int64", index=pdf.index)
            out["contam4"] = pd.Series(c4, dtype="int64", index=pdf.index)
            yield out

    return staged.mapInPandas(score, schema=schema).drop("_sh")


def decontaminate_gate(
    docs: DataFrame,
    eval_shingles: set[str],
    text_col: str = "text",
    n: int = 3,
    threshold: float = CONTAM_THRESHOLD,
) -> DataFrame:
    """Keep only documents whose eval overlap is under ``threshold``
    (docs with no shingles always pass — same as the batch operator,
    which never emits a row for them). Stateless: safe in append mode
    with no watermark."""
    scored = with_contamination(docs, eval_shingles, text_col, n)
    keep = (F.col("n_shingles") == 0) | (
        F.col("n_overlap").cast("double") / F.col("n_shingles") < threshold
    )
    return scored.filter(keep).drop("n_overlap", "n_shingles", "contam4")
