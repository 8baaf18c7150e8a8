"""Round-8 streaming-twin ratchet: the Bloom-backed novelty gate
(streaming/novelty.py) — bounded-state intake gating.

1. Gate decisions equal the EXACT sequential reference (batch-
   granularity set semantics over the same Spark-built shingle
   arrays) on the fixture — the deterministic double-hash bloom at
   m=2^22 has no consequential false positive here.
2. Mid-write crash (pre-flip, the widest window) + restart converges
   to the uninterrupted run's survivors AND bitmap, because the OR
   merge is idempotent and the pointer flip is atomic.
3. The state is BOUNDED: m/8 bytes regardless of how many documents
   stream through (the whole point vs exact seen-shingle state).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import shingles, tokens
from kafkastreamer_spark.streaming import statedir
from kafkastreamer_spark.streaming.novelty import (
    NOVELTY_THRESHOLD,
    _hash_uniques,
    _member_mask,
    _positions,
    _positions_batch,
    _set,
    _set_batch,
    _test,
    bloom_fill_ratio,
    maintain_novelty_gate,
    read_bloom,
)
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table


def _batches(spark, sf_dir, tmp_path, n_batches=3):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    inp = str(tmp_path / "in")
    splits = []
    for i in range(n_batches):
        part = docs.filter(F.col("doc_id") % n_batches == i)
        part.coalesce(1).write.mode("append").parquet(inp)
        splits.append(part)
    return docs, inp, splits


def _exact_reference(spark, splits, threshold):
    """Sequential batch-granularity set semantics over the SAME Spark
    shingle expression: all docs of a batch score against the set as
    of the batch start; admitted docs' shingles join the set after."""
    seen: set[str] = set()
    survivors: set[int] = set()
    for part in splits:
        rows = (
            part.select("doc_id", shingles(tokens("text")).alias("sh"))
            .collect()
        )
        admitted = []
        for r in rows:
            sh = list(r["sh"])
            if not sh:
                survivors.add(r["doc_id"])
                continue
            novel = sum(1 for s in sh if s not in seen)
            if novel >= threshold * len(sh):
                survivors.add(r["doc_id"])
                admitted.append(sh)
        for sh in admitted:
            seen.update(sh)
    return survivors


def _run(spark, inp, schema, state, out, ckpt, hook=None):
    stream = file_source(spark, inp, schema, max_files_per_trigger=1)
    q = maintain_novelty_gate(
        stream, state, out, ckpt, pre_flip_hook=hook
    )
    q.awaitTermination(300)


def _survivors(spark, out):
    return {r["doc_id"] for r in spark.read.parquet(out).collect()}


def test_novelty_gate_matches_exact_reference(spark, sf_dir, tmp_path):
    docs, inp, splits = _batches(spark, sf_dir, tmp_path)
    want = _exact_reference(spark, splits, NOVELTY_THRESHOLD)
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    _run(spark, inp, docs.schema, state, out, str(tmp_path / "ckpt"))
    got = _survivors(spark, out)
    assert got == want
    # the gate actually gated: some docs rejected, some admitted
    n_docs = docs.count()
    assert got and len(got) < n_docs


def test_novelty_gate_crash_replay_converges(spark, sf_dir, tmp_path):
    class Boom(Exception):
        pass

    def crash_on_1(batch_id):
        if batch_id == 1:
            raise Boom("injected")

    docs, inp, _ = _batches(spark, sf_dir, tmp_path)
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = file_source(spark, inp, docs.schema, max_files_per_trigger=1)
    q = maintain_novelty_gate(
        stream, state, out, ckpt, pre_flip_hook=crash_on_1
    )
    with pytest.raises(Exception):  # noqa: PT011
        q.awaitTermination(300)
    assert statedir.applied_batch(state) == 0  # batch-0 bloom intact

    _run(spark, inp, docs.schema, state, out, ckpt)

    # uninterrupted twin for ground truth
    state2, out2 = str(tmp_path / "state2"), str(tmp_path / "out2")
    _run(spark, inp, docs.schema, state2, out2, str(tmp_path / "ckpt2"))
    assert _survivors(spark, out) == _survivors(spark, out2)
    assert read_bloom(spark, state) == read_bloom(spark, state2)


def test_novelty_gate_post_flip_replay_skips(spark, sf_dir, tmp_path):
    """Round-9 ADVICE-high fix: a crash AFTER the pointer flip but
    BEFORE the checkpoint commit re-delivers the batch. Re-scoring it
    against a bloom that already contains its own admitted shingles
    would reject previously admitted docs and overwrite the batch's
    survivor dir with fewer rows — the applied-batch skip must leave
    both sinks untouched. Simulated end-to-end by deleting the final
    batch's checkpoint commit record and restarting."""
    docs, inp, _ = _batches(spark, sf_dir, tmp_path)
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, inp, docs.schema, state, out, ckpt)
    want_surv = _survivors(spark, out)
    want_bloom = read_bloom(spark, state)
    last = statedir.applied_batch(state)
    assert last == 2
    # erase the commit record only: offsets/2 survives, so the
    # restarted query replays exactly batch 2 with the same data —
    # the post-flip crash window
    for name in (str(last), f".{last}.crc"):
        p = os.path.join(ckpt, "commits", name)
        if os.path.exists(p):
            os.remove(p)
    _run(spark, inp, docs.schema, state, out, ckpt)
    assert _survivors(spark, out) == want_surv
    assert read_bloom(spark, state) == want_bloom


def test_novelty_gate_raises_on_saturation(spark, sf_dir, tmp_path):
    """An undersized bitmap must FAIL the query with the m-sizing
    message, not keep gating with decayed (reject-everything)
    decisions — and the state stays at the last healthy publish."""
    docs, inp, _ = _batches(spark, sf_dir, tmp_path, n_batches=1)
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    stream = file_source(spark, inp, docs.schema, max_files_per_trigger=1)
    q = maintain_novelty_gate(
        stream, state, out, str(tmp_path / "ckpt"), m_bits=1 << 10
    )
    with pytest.raises(Exception) as ei:  # noqa: PT011
        q.awaitTermination(300)
    assert "undersized" in str(ei.value)
    assert statedir.applied_batch(state) is None  # nothing published


def test_novelty_gate_rejects_non_power_of_two_m(spark, sf_dir, tmp_path):
    docs, inp, _ = _batches(spark, sf_dir, tmp_path, n_batches=1)
    stream = file_source(spark, inp, docs.schema, max_files_per_trigger=1)
    with pytest.raises(ValueError, match="power of two"):
        maintain_novelty_gate(
            stream,
            str(tmp_path / "state"),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
            m_bits=3000,
        )


def test_vectorized_bloom_ops_match_scalar_reference():
    """The numpy batch path (unique-shingle md5 + whole-array
    positions/membership/sets) must be bit-identical to the scalar
    reference — including at small power-of-two m where the mod-2^64
    wrap in uint64 arithmetic is exercised hardest."""
    import numpy as np

    shingle_list = [f"tok{i} tok{i + 1} tok{i + 2}" for i in range(513)]
    uniq = np.asarray(shingle_list, dtype=object)
    for m in (1 << 10, 1 << 16, 1 << 22):
        pos = _positions_batch(*_hash_uniques(uniq), m)
        for row, s in zip(pos, shingle_list):
            assert list(row) == _positions(s, m)
        bloom_vec = np.zeros(m // 8, dtype=np.uint8)
        bloom_ref = np.zeros(m // 8, dtype=np.uint8)
        half = pos[: len(shingle_list) // 2]
        _set_batch(bloom_vec, half)
        for s in shingle_list[: len(shingle_list) // 2]:
            _set(bloom_ref, _positions(s, m))
        assert bytes(bloom_vec) == bytes(bloom_ref)
        got = _member_mask(bloom_vec, pos)
        want = [
            _test(bloom_ref, _positions(s, m)) for s in shingle_list
        ]
        assert list(got) == want
        assert all(got[: len(shingle_list) // 2])  # set => member


def test_bloom_state_is_bounded(spark, sf_dir, tmp_path):
    docs, inp, _ = _batches(spark, sf_dir, tmp_path, n_batches=2)
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    _run(spark, inp, docs.schema, state, out, str(tmp_path / "ckpt"))
    bloom = read_bloom(spark, state)
    assert len(bloom) == (1 << 22) // 8  # m/8 bytes, corpus-independent
    fill = bloom_fill_ratio(bloom)
    assert 0.0 < fill < 0.5, f"fill ratio {fill} out of healthy band"


def test_spark_side_hash_columns_match_python_md5(spark):
    """The JVM-side md5/conv staging must reassemble to exactly the
    Python reference's (h1, h2) — big-endian digest halves — for any
    shingle text, including unicode."""
    import numpy as np

    from kafkastreamer_spark.streaming.novelty import (
        _HASH_COLS,
        _flat_positions,
        _with_shingle_hashes,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "naive café über żółć 漢字 tokens here"),
            (3, ""),  # no shingles
            (4, "x y z w"),
        ],
        "doc_id int, text string",
    )
    staged = _with_shingle_hashes(df, 3, "text").orderBy("doc_id")
    pdf = staged.toPandas()
    lens = pdf["_sh"].map(len).to_numpy(dtype=np.int64)
    total = int(lens.sum())
    assert total > 0
    for m in (1 << 10, 1 << 22):
        got = _flat_positions(pdf, total, m)
        flat = [s for arr in pdf["_sh"] for s in arr]
        want = np.asarray([_positions(s, m) for s in flat])
        assert (got == want).all()
    # and the uint64 halves themselves match the Python reference
    q = [
        np.fromiter(
            (v for arr in pdf[c] for v in arr), dtype=np.int64, count=total
        ).astype(np.uint64)
        for c in _HASH_COLS
    ]
    h1 = (q[0] << np.uint64(32)) | q[1]
    h2 = (q[2] << np.uint64(32)) | q[3]
    flat_arr = np.asarray(
        [s for arr in pdf["_sh"] for s in arr], dtype=object
    )
    w1, w2 = _hash_uniques(flat_arr)
    assert (h1 == w1).all() and (h2 == w2).all()
