"""Regression guard for the round-10 x256 broadcast finding: the four
queries whose corpus-sized join sides were planned as broadcasts
(width-ratio size underestimate vs autoBroadcastJoinThreshold) must
keep their sort-merge hints. Without the hints the bug is invisible
at test scale — the broadcasts FIT at sf0.001 — so this test asserts
the PLAN, not the outcome: no BroadcastExchange anywhere in these
queries except the df-capped stop-shingle list (bounded by
construction, legitimately broadcast).

scripts/broadcast_audit.py is the discovery instrument for NEW
queries; this test pins the known-fixed ones.
"""

from __future__ import annotations

import re

import pytest

from kafkastreamer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

FIXED = (
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_lsh_recall_audit",
    "multimodal_image_ahash_pairs",
)


def _broadcast_subtrees(plan: str) -> list[list[str]]:
    lines = plan.splitlines()

    def depth(s: str) -> int:
        m = re.match(r"^[\s:+\-*]*", s)
        return len(m.group(0)) if m else 0

    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d0 = depth(line)
        sub = [line]
        for j in range(i + 1, len(lines)):
            if depth(lines[j]) <= d0:
                break
            sub.append(lines[j])
        out.append(sub)
    return out


@pytest.mark.parametrize("name", FIXED)
def test_no_corpus_sized_broadcasts(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    for sub in _broadcast_subtrees(plan):
        text = "\n".join(sub)
        # the only sanctioned broadcast: the df-capped stop-shingle
        # list (Filter df > NGRAM_DF_CAP over the shingle df counts)
        assert re.search(r"Filter \(df#\d+L? > \d+\)", text), (
            f"{name}: unexpected broadcast build side:\n{text[:500]}"
        )
    # and the corpus-sized self-join really is a sort-merge join
    assert "SortMergeJoin" in plan, f"{name}: no SortMergeJoin in plan"
