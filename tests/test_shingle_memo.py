"""_SHINGLE_MEMO contract (VERDICT r11 #6 / ADVICE r11): per-sf_dir
isolation — two fixture dirs in one session must get independent
memo entries (cross-sf_dir contamination is the one silent failure
mode a path-keyed memo could introduce) — plus the documented
invalidation escape hatch for callers that rewrite a fixture dir."""

from __future__ import annotations

import os

from kafkastreamer_spark.operators.dedup import (
    _SHINGLE_MEMO,
    _shingle_sets,
    invalidate_shingle_memo,
)

SF_A = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_B = "/root/testdata/sf0.01"


def test_second_sf_dir_gets_own_entry(spark):
    invalidate_shingle_memo(spark)
    a = _shingle_sets(spark, SF_A)
    b = _shingle_sets(spark, SF_B)
    per_session = _SHINGLE_MEMO[spark]
    assert per_session[SF_A] is a and per_session[SF_B] is b
    assert a is not b
    # The entries really read different data, not a shared plan:
    # both fixtures hold 500 documents, but their text differs, so
    # the total shingle count is a content checksum.
    from pyspark.sql import functions as F

    sum_a = a.agg(F.sum(F.size("sh"))).first()[0]
    sum_b = b.agg(F.sum(F.size("sh"))).first()[0]
    assert sum_a and sum_b and sum_a != sum_b
    # Memo hit: same object back, still pinned.
    assert _shingle_sets(spark, SF_A) is a
    assert a.storageLevel.useMemory or a.storageLevel.useDisk


def test_invalidate_drops_one_dir_only(spark):
    invalidate_shingle_memo(spark)
    a = _shingle_sets(spark, SF_A)
    b = _shingle_sets(spark, SF_B)
    invalidate_shingle_memo(spark, SF_A)
    per_session = _SHINGLE_MEMO[spark]
    assert SF_A not in per_session and per_session[SF_B] is b
    # invalidation unpersisted the dropped entry
    assert not (a.storageLevel.useMemory or a.storageLevel.useDisk)
    # next call rebuilds a fresh plan for the invalidated dir
    a2 = _shingle_sets(spark, SF_A)
    assert a2 is not a
    invalidate_shingle_memo(spark)
    assert not _SHINGLE_MEMO.get(spark)


def test_clear_cache_survivor_repins(spark):
    """Driver protocol: clearCache between queries must not hand back
    an unpinned fan-out on the next memo hit."""
    invalidate_shingle_memo(spark)
    a = _shingle_sets(spark, SF_A)
    spark.catalog.clearCache()
    a2 = _shingle_sets(spark, SF_A)
    assert a2 is a
    assert a2.storageLevel.useMemory or a2.storageLevel.useDisk
    invalidate_shingle_memo(spark)
