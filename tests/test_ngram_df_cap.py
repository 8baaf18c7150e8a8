"""df cap in dedup_ngram_jaccard: a stop-shingle shared by every doc
must not generate quadratic candidate pairs, and the capped Jaccard
must still match the DuckDB oracle exactly."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from kafkastreamer_spark.operators.dedup import NGRAM_DF_CAP, dedup_ngram_jaccard
from kafkastreamer_spark.registry import REGISTRY
from tests._compare import assert_matches_oracle

N_DOCS = NGRAM_DF_CAP * 4  # stop-shingle df = 4x the cap


def _write_fixture(spark, tmp_path) -> str:
    """N_DOCS docs, each sharing one boilerplate sentence (every one of
    its shingles has df = N_DOCS > cap) followed by a per-doc unique
    tail; two genuine near-dup docs sharing a rare tail."""
    boiler = "terms of service apply to all content herein"
    rows = []
    for i in range(N_DOCS):
        tail = f"unique alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"
        rows.append((i, f"{boiler} {tail}"))
    # near-dup pair on rare shingles only (df=2, below cap)
    rows.append((N_DOCS, f"{boiler} rare shared tail one two three"))
    rows.append((N_DOCS + 1, f"{boiler} rare shared tail one two nine"))
    df = spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "fixture")
    df.coalesce(2).write.parquet(f"{out}/documents.parquet")
    return out


def test_stop_shingle_candidates_bounded_and_oracle_exact(spark, tmp_path):
    sf_dir = _write_fixture(spark, tmp_path)

    # Candidate volume: rebuild the capped posting list the operator
    # uses and count self-join candidates. Without the cap the boiler
    # shingles alone give ~8 * C(N_DOCS+2, 2) ≈ 138k pairs; with it,
    # only the rare-tail pair survives.
    from kafkastreamer_spark.operators._embed import shingles, tokens
    from kafkastreamer_spark.tables import load_table

    sh = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("w"))
        .select("doc_id", shingles(F.col("w")).alias("sh"))
    )
    posting0 = sh.select("doc_id", F.explode("sh").alias("s"))
    dfreq = posting0.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    capped = posting0.join(
        dfreq.filter(F.col("df") > NGRAM_DF_CAP).select("s"), "s", "left_anti"
    )
    a, b = capped.alias("a"), capped.alias("b")
    n_candidates = a.join(
        b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).count()
    uncapped_floor = (N_DOCS * (N_DOCS - 1)) // 2  # boiler pairs alone
    assert n_candidates < uncapped_floor / 100
    assert n_candidates <= 20  # rare tail overlap only

    # Oracle parity on the adversarial fixture (same check the driver runs).
    result = dedup_ngram_jaccard(spark, sf_dir)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    assert_matches_oracle(
        result, con, REGISTRY["dedup_ngram_jaccard"].oracle, "dedup_ngram_jaccard"
    )

    # The genuine near-dup pair (rare shared tail) must survive the cap.
    pairs = {(r.doc_a, r.doc_b) for r in result.collect()}
    assert (N_DOCS, N_DOCS + 1) in pairs
