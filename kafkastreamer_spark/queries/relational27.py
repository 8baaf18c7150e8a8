"""Round-9 batch 236: first-principles LogLog cardinality audit.

``agg_loglog_cardinality_audit`` completes the engine's
sketches-from-first-principles-on-md5 family: Count-Min
(operators/sketches.py) covers frequency, MinHash covers similarity,
and this covers CARDINALITY — an HLL-style register estimator whose
every step (register assignment, leading-zero rank, harmonic sum,
estimate) is exact integer arithmetic on md5, so the whole sketch and
its estimate are cross-engine deterministic and the oracle is exact.
Spark's own approx_count_distinct (HLL++) is the production fast
path; its binary state is not reproducible across engines
(``agg_approx`` stays the rows-only entry for exactly that reason) —
this audit is the verifiable twin that MEASURES what the register
estimator costs in accuracy per event_type.

Reference parity note: the reference keeps exact per-key state
(Streamer.java:323-344); bounded-register cardinality is the 100 TB
answer. SURVEY §2 Part-B sketch closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

_LL_M = 64  # registers (2^6)
_LL_WBITS = 26  # 32-bit hash minus 6 register bits
#: HLL alpha_64 = 0.709 exactly as the rational 709/1000 — a CONSTANT
#: of the estimator, kept rational so the estimate math stays integer
_LL_ALPHA_NUM, _LL_ALPHA_DEN = 709, 1000


def _rank_case(w: str) -> str:
    """Leading-zero rank of the {0..2^26-1} window as a CASE ladder —
    shared SQL text for both engines (no log2, no floats): rank 1 for
    the top bit set, ..., 27 when the window is all zeros."""
    arms = " ".join(
        f"WHEN {w} >= {1 << (_LL_WBITS - r)} THEN {r}"
        for r in range(1, _LL_WBITS + 1)
    )
    return f"CASE {arms} ELSE {_LL_WBITS + 1} END"


@register(
    "agg_loglog_cardinality_audit",
    oracle=f"""
        WITH keys AS (
            SELECT DISTINCT event_type, user_id FROM events
        ),
        hashed AS (
            SELECT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                        AS BIGINT) AS h
            FROM keys
        ),
        ranked AS (
            SELECT event_type, h % {_LL_M} AS reg,
                   {_rank_case(f"(h // {_LL_M})")} AS rank
            FROM hashed
        ),
        regs AS (
            SELECT event_type, reg, CAST(max(rank) AS BIGINT) AS m_j
            FROM ranked GROUP BY event_type, reg
        ),
        rmax AS (
            SELECT event_type, CAST(max(m_j) AS BIGINT) AS r,
                   CAST(count(*) AS BIGINT) AS n_used
            FROM regs GROUP BY event_type
        ),
        -- harmonic sum over ALL {_LL_M} registers at the common
        -- denominator 2^r: used registers add 2^(r - m_j), the
        -- ({_LL_M} - n_used) empty ones add 2^r each (2^-0 = 1)
        snum AS (
            SELECT g.event_type,
                   CAST(sum(CAST(1 AS BIGINT) << (x.r - g.m_j))
                        + ({_LL_M} - max(x.n_used))
                          * (CAST(1 AS BIGINT) << max(x.r))
                        AS BIGINT) AS s_num,
                   CAST(max(x.r) AS BIGINT) AS r
            FROM regs g JOIN rmax x ON x.event_type = g.event_type
            GROUP BY g.event_type
        ),
        exact AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS exact_distinct
            FROM keys GROUP BY event_type
        )
        SELECT e.event_type, e.exact_distinct,
               CAST((CAST({_LL_ALPHA_NUM} AS BIGINT) * {_LL_M * _LL_M}
                    * (CAST(1 AS BIGINT) << s.r) * 10000)
                    // ({_LL_ALPHA_DEN} * s.s_num) AS BIGINT) AS estimate4,
               CAST(((CAST({_LL_ALPHA_NUM} AS BIGINT) * {_LL_M * _LL_M}
                    * (CAST(1 AS BIGINT) << s.r) * 10000)
                    // ({_LL_ALPHA_DEN} * s.s_num)
                    - e.exact_distinct * 10000) * 100
                    // e.exact_distinct AS BIGINT) AS err_pct4
        FROM exact e JOIN snum s ON s.event_type = e.event_type
        ORDER BY e.event_type
    """,
    tags=("sketch", "aggregate", "evaluation"),
)
def agg_loglog_cardinality_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HLL-style register cardinality estimator built from first
    principles on md5, audited against exact distinct counts per
    event_type: each distinct user hashes to one of {_LL_M} registers
    (low 6 bits) with a leading-zero rank of the remaining
    {_LL_WBITS}-bit window (CASE ladder — no log2, no floats); the
    raw-HLL estimate alpha*m^2 / sum(2^-M_j) evaluates EXACTLY
    because the harmonic sum is a dyadic rational — at the common
    denominator 2^max(M_j) (<= 2^{_LL_WBITS + 1}) the numerator fits
    BIGINT with 10^4 fixed-point headroom, so estimate and signed
    error are integer arithmetic on both engines. Raw estimator, no
    small/large-range corrections (stated; the fixture's per-type
    cardinalities sit in the raw regime), alpha_64 = 709/1000 kept
    rational.

    Scale shape: ONE exchange (the distinct (type, user) rollup —
    map-side combine); register maxima aggregate the distinct-key
    relation to <= |types| x {_LL_M} rows; everything after is
    arithmetic on a |types|-row table. At 100 TB the register table
    IS the shuffle payload — {_LL_M} longs per group — which is the
    entire point of the sketch.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    keys = ev.select("event_type", "user_id").distinct().persist()
    hashed = keys.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        )
        .cast("long")
        .alias("h"),
    )
    ranked = hashed.select(
        "event_type",
        (F.col("h") % _LL_M).alias("reg"),
        F.expr(_rank_case(f"(h div {_LL_M})")).cast("long").alias("rank"),
    )
    regs = ranked.groupBy("event_type", "reg").agg(
        F.max("rank").cast("long").alias("m_j")
    )
    rmax = regs.groupBy("event_type").agg(
        F.max("m_j").cast("long").alias("r"),
        F.count(F.lit(1)).cast("long").alias("n_used"),
    )
    snum = (
        regs.join(rmax, "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(r - m_j AS INT))"))
                + (F.lit(_LL_M) - F.max("n_used"))
                * F.max(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(r AS INT))"))
            )
            .cast("long")
            .alias("s_num"),
            F.max("r").cast("long").alias("r"),
        )
    )
    exact = keys.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("exact_distinct")
    )
    est_expr = (
        f"({_LL_ALPHA_NUM}L * {_LL_M * _LL_M} * "
        f"shiftleft(CAST(1 AS BIGINT), CAST(r AS INT)) * 10000)"
        f" div ({_LL_ALPHA_DEN} * s_num)"
    )
    return (
        exact.join(snum, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            F.expr(est_expr).cast("long").alias("estimate4"),
            F.expr(
                f"(({est_expr}) - exact_distinct * 10000) * 100"
                " div exact_distinct"
            )
            .cast("long")
            .alias("err_pct4"),
        )
        .orderBy("event_type")
    )
