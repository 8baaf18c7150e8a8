"""Property-based tests (hypothesis) for engine invariants:
stage-chain algebra, topology validation, fixed-point determinism,
salting equivalence."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafkastreamer_spark.plans import PipelineSpec, StageSpec, compile_pipeline
from kafkastreamer_spark.plans.pipeline import TopologyError, validate_spec
from kafkastreamer_spark.streaming.stages import STAGE_FUNCTIONS

OPS = st.sampled_from(["adder", "diff", "identity", "power"])

# Spark jobs per example are expensive — keep example counts small and
# batch values into a single DataFrame per example.
FAST = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _net_delta(ops: list[str]) -> int:
    """adder=+1, diff=-1, identity/power(arg 1)=0 — the reference's
    whole arithmetic algebra at arg=1 (Streamer.java:166-180)."""
    return sum(+1 if o == "adder" else -1 if o == "diff" else 0 for o in ops)


@FAST
@given(ops=st.lists(OPS, min_size=1, max_size=8))
def test_chain_equals_net_delta(spark, ops):
    spec = validate_spec(
        PipelineSpec(stages=tuple(StageSpec(i, op) for i, op in enumerate(ops)))
    )
    df = spark.range(0, 50).select(F.col("id").alias("value"))
    out = compile_pipeline(spec)(df)
    vals = sorted(r["value"] for r in out.collect())
    d = _net_delta(ops)
    assert vals == [i + d for i in range(50)]


@FAST
@given(
    numbers=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=8, unique=True)
)
def test_validation_accepts_iff_contiguous(numbers, spark):
    spec = PipelineSpec(stages=tuple(StageSpec(n, "adder") for n in numbers))
    contiguous = sorted(numbers) == list(range(len(numbers)))
    if contiguous:
        validate_spec(spec)
    else:
        try:
            validate_spec(spec)
        except TopologyError:
            pass
        else:
            raise AssertionError("non-contiguous stages accepted")


@FAST
@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    ),
    n_parts=st.integers(min_value=1, max_value=8),
)
def test_fixed_point_sum_partition_invariant(spark, values, n_parts):
    """The engine's money-sum discipline must give identical results
    for ANY partitioning of the data (the property the DuckDB oracle
    comparison relies on)."""
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    def fp_sum(frame):
        return (
            frame.agg(
                (F.sum(F.floor(F.col("x") * 10000).cast("long")).cast("double") / 10000)
                .alias("s")
            ).collect()[0]["s"]
        )
    assert fp_sum(df.coalesce(1)) == fp_sum(df.repartition(n_parts))


def test_stage_function_registry_closed(spark):
    """Unknown names must dispatch to identity, not fail (reference
    fallback, Streamer.java:200-203)."""
    from kafkastreamer_spark.streaming.stages import stage_function

    fn = stage_function("definitely-not-an-op")
    col = F.lit(7)
    df = spark.range(1).select(fn(col, 1).alias("v"))
    assert df.collect()[0]["v"] == 7
    assert set(STAGE_FUNCTIONS) == {"adder", "power", "diff", "identity"}


@FAST
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=120), min_size=1, max_size=6
    )
)
def test_chunking_covers_every_token(spark, texts):
    """Chunk invariants on arbitrary texts: chunk count per doc is
    ceil(n_tokens/stride); every chunk except the last per doc has
    exactly CHUNK_TOKENS tokens; token positions are fully covered."""
    import math

    from kafkastreamer_spark.operators.training import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )
    from kafkastreamer_spark.operators._embed import tokens as tok_expr

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    w = df.select("doc_id", tok_expr("text").alias("w"))
    start = F.col("chunk_idx") * CHUNK_STRIDE
    chunk = F.slice(F.col("w"), start + 1, F.lit(CHUNK_TOKENS))
    out = (
        w.select(
            "doc_id",
            "w",
            F.size("w").alias("n"),
            F.explode(
                F.sequence(F.lit(0), F.floor((F.size("w") - 1) / CHUNK_STRIDE))
            ).alias("chunk_idx"),
        )
        .select("doc_id", "n", "chunk_idx", F.size(chunk).alias("n_tok"))
        .collect()
    )
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in per_doc.items():
        n = rows[0]["n"]
        assert len(rows) == max(1, math.ceil(n / CHUNK_STRIDE))
        rows.sort(key=lambda r: r["chunk_idx"])
        for r in rows[:-1]:
            # non-final chunks are full-size unless the doc is shorter
            assert r["n_tok"] == min(CHUNK_TOKENS, n - r["chunk_idx"] * CHUNK_STRIDE)
        last = rows[-1]
        # final chunk reaches the end of the doc exactly
        assert last["chunk_idx"] * CHUNK_STRIDE + last["n_tok"] == n


@FAST
@given(
    n_toks=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=40)
)
def test_packing_offsets_contiguous(spark, n_toks):
    """Packing invariants: offsets are the exclusive prefix sum in
    doc order; pack_id is monotone non-decreasing; every pack except
    the last starts within PACK_WINDOW of its id boundary."""
    from kafkastreamer_spark.operators.training import PACK_WINDOW
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, "x", n) for i, n in enumerate(n_toks)], ["doc_id", "lang", "n_tok"]
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    rows = (
        df.select(
            "doc_id",
            "n_tok",
            offset.alias("offset"),
            F.floor(offset / PACK_WINDOW).cast("long").alias("pack_id"),
        )
        .orderBy("doc_id")
        .collect()
    )
    run = 0
    prev_pack = 0
    for r in rows:
        assert r["offset"] == run
        run += r["n_tok"]
        assert r["pack_id"] == r["offset"] // PACK_WINDOW
        assert r["pack_id"] >= prev_pack
        prev_pack = r["pack_id"]


@FAST
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4095),
            st.integers(min_value=0, max_value=4095),
        ),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
def test_zorder_interleave_bijective(spark, pairs):
    """The Morton interleave must be a bijection on 12-bit pairs (no
    two (x, d) share a key) and must equal the bit-interleave
    definition computed directly in Python."""
    from kafkastreamer_spark.queries.relational10 import _z_interleave

    df = spark.createDataFrame(pairs, "xn long, dn long").select(
        "xn", "dn", F.expr(_z_interleave("div")).alias("z")
    )
    rows = df.collect()
    zs = {(r.xn, r.dn): r.z for r in rows}
    assert len(set(zs.values())) == len(zs)  # bijective on the sample

    def py_z(x, d):
        return sum(
            (((x >> i) & 1) << (2 * i)) | (((d >> i) & 1) << (2 * i + 1))
            for i in range(12)
        )

    for (x, d), z in zs.items():
        assert z == py_z(x, d)  # matches the bit-interleave definition


@FAST
@given(
    texts=st.lists(
        st.text(
            alphabet="abcdef ",
            min_size=1,
            max_size=120,
        ).filter(lambda t: t.strip()),
        min_size=1,
        max_size=12,
    )
)
def test_lexical_diversity_matches_counter(spark, texts):
    """TTR/hapax from the nested higher-order-function plan must match
    a direct collections.Counter computation for arbitrary texts."""
    import re
    from collections import Counter

    from kafkastreamer_spark.operators._embed import tokens

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    w = F.col("w")
    hapax = F.size(
        F.filter(
            F.array_distinct(w), lambda t: F.size(F.filter(w, lambda x: x == t)) == 1
        )
    )
    got = {
        r.doc_id: (r.n_types, r.n_hapax)
        for r in df.select("doc_id", tokens("text").alias("w"))
        .select(
            "doc_id",
            F.size(F.array_distinct(w)).alias("n_types"),
            hapax.alias("n_hapax"),
        )
        .collect()
    }
    for i, t in enumerate(texts):
        c = Counter(re.split(r"\s+", t.lower()))
        assert got[i] == (len(c), sum(1 for v in c.values() if v == 1)), t


@FAST
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["the", "a", "of", "zz", "qqq", "wxyz", "0", "42"]),
            min_size=1,
            max_size=200,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_gopher_flags_match_python_reference(spark, docs):
    """The four integer-arithmetic Gopher flags must agree with a
    direct float-free Python evaluation on arbitrary token lists."""
    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    df.createOrReplaceTempView("prop_docs")
    from kafkastreamer_spark.operators.quality import quality_gopher_rules  # noqa: F401
    from kafkastreamer_spark.registry import REGISTRY

    # Evaluate the same flag expressions directly on the tiny frame
    # (the registered query reads from a fixture dir, so rebuild its
    # per-doc projection here against the reference semantics).
    w = F.split(F.lower("text"), r"\s+")
    f = df.select(
        "doc_id",
        F.size(w).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(w, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.filter(w, lambda t: t.isin("the", "a", "and", "of", "to")))
        .cast("long")
        .alias("n_stop"),
        F.size(F.filter(w, lambda t: t.rlike("[a-z]"))).cast("long").alias("n_alpha"),
    )
    got = {r.doc_id: r.asDict() for r in f.collect()}
    for i, d in enumerate(docs):
        n_words = len(d)
        total_chars = sum(len(t) for t in d)
        n_stop = sum(1 for t in d if t in ("the", "a", "and", "of", "to"))
        n_alpha = sum(1 for t in d if any("a" <= ch <= "z" for ch in t))
        g = got[i]
        assert g["n_words"] == n_words
        assert g["total_chars"] == total_chars
        assert g["n_stop"] == n_stop
        assert g["n_alpha"] == n_alpha
