"""Round-10 batch 241: dedup operating-point ladder, session
co-occurrence lift, A/B sample-ratio-mismatch guardrail.

* ``dedup_jaccard_threshold_ladder`` — how many near-dup pairs (and
  how many documents) each Jaccard threshold rung would implicate:
  the operating-point table a dedup rollout reads before choosing its
  threshold, built from ONE pair computation (the registered
  dedup_ngram_jaccard pipeline) — the text-side companion of
  dedup_semdedup_threshold_sweep.
* ``events_session_cooccurrence`` — within-session event-type
  co-occurrence with lift: which behaviors travel together inside one
  30-minute session (the session-level counterpart of
  basket_pair_cooccurrence's order-level and
  text_cooccurrence_lift's document-level pairing).
* ``events_ab_srm_guardrail`` — Sample Ratio Mismatch check for a
  hash-bucketed 50/50 A/B assignment: chi-square of observed arm
  sizes against the designed split, the guardrail that must pass
  BEFORE events_ab_test_analysis's effect estimate means anything.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B analytics /
LLM-pipeline closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators.dedup import (
    NGRAM_DF_CAP,
    SQL_TOKENS,
    dedup_ngram_jaccard,
    sql_shingles,
)
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# dedup_jaccard_threshold_ladder
# ---------------------------------------------------------------------------

_JACC_RUNGS = (2000, 4000, 6000, 8000)  # jaccard * 1e4


@register(
    "dedup_jaccard_threshold_ladder",
    oracle=f"""
        WITH words AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
        sh AS (SELECT doc_id, {sql_shingles('w')} AS sh
               FROM words WHERE len(w) >= 3),
        posting0 AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        dfreq AS (SELECT s, COUNT(*) AS df FROM posting0 GROUP BY s),
        posting AS (
            SELECT p.doc_id, p.s FROM posting0 p
            JOIN dfreq d ON p.s = d.s AND d.df <= {NGRAM_DF_CAP}
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM posting GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM posting a JOIN posting b
              ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT doc_a, doc_b,
                   CAST(FLOOR(CAST(n_common AS DOUBLE)
                        / (sa.n + sb.n - n_common) * 10000) AS BIGINT)
                       AS jaccard4
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
        ),
        rungs AS (SELECT unnest([{", ".join(str(r) for r in _JACC_RUNGS)}])
                      AS thr4),
        ladder AS (
            SELECT r.thr4, p.doc_a, p.doc_b
            FROM pairs p JOIN rungs r ON p.jaccard4 >= r.thr4
        )
        SELECT thr4,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST((SELECT count(DISTINCT d) FROM (
                    SELECT doc_a AS d FROM ladder l2 WHERE l2.thr4 = l.thr4
                    UNION ALL
                    SELECT doc_b AS d FROM ladder l3 WHERE l3.thr4 = l.thr4
               )) AS BIGINT) AS n_docs
        FROM ladder l GROUP BY thr4 ORDER BY thr4
    """,
    tags=("llm-data", "dedup", "operating-point"),
)
def dedup_jaccard_threshold_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Operating-point ladder for the word-3-gram Jaccard dedup: for
    each candidate threshold ({", ".join(str(r) for r in _JACC_RUNGS)}
    in 1e-4), the pair count and the number of documents implicated —
    the table that prices a threshold choice in removed-document
    volume BEFORE a rollout, from ONE pair computation (the
    registered dedup_ngram_jaccard pipeline; rung 2000 IS its
    operating point, so this ladder brackets it from above).

    Scale shape: the expensive part (posting self-join + Jaccard
    verify) runs once and is corpus-linear after the df cap; the
    ladder explode multiplies only the near-dup PAIR table (bounded
    by true duplicate density) by {len(_JACC_RUNGS)} rungs.
    """
    pairs = dedup_ngram_jaccard(spark, sf_dir).select(
        "doc_a", "doc_b", "jaccard4"
    )
    rungs = F.explode(
        F.array(*[F.lit(r).cast("long") for r in _JACC_RUNGS])
    ).alias("thr4")
    ladder = (
        pairs.select("doc_a", "doc_b", "jaccard4", rungs)
        .filter(F.col("jaccard4") >= F.col("thr4"))
        .persist()  # pair rollup + doc rollup both read it
    )
    n_pairs = ladder.groupBy("thr4").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    n_docs = (
        ladder.select(
            "thr4", F.explode(F.array("doc_a", "doc_b")).alias("d")
        )
        .groupBy("thr4")
        .agg(F.count_distinct("d").cast("long").alias("n_docs"))
    )
    return n_pairs.join(n_docs, "thr4").orderBy("thr4")


# ---------------------------------------------------------------------------
# events_session_cooccurrence
# ---------------------------------------------------------------------------


@register(
    "events_session_cooccurrence",
    oracle="""
        WITH s AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) // 1000000
                                - lag(epoch_us(ts) // 1000000) OVER w
                                > 1800
                        THEN 1 ELSE 0 END AS ns
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, event_type,
                   sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
            FROM s
        ),
        st AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_sessions
            FROM (SELECT DISTINCT user_id, sid FROM st)
        ),
        na AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS c
            FROM st GROUP BY 1
        ),
        p AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_ab
            FROM st a JOIN st b
              ON b.user_id = a.user_id AND b.sid = a.sid
             AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT p.type_a, p.type_b, p.n_ab,
               na1.c AS n_a, na2.c AS n_b,
               CAST((p.n_ab * t.n_sessions * 10000) // (na1.c * na2.c)
                    AS BIGINT) AS lift4
        FROM p
        JOIN na na1 ON na1.event_type = p.type_a
        JOIN na na2 ON na2.event_type = p.type_b
        CROSS JOIN tot t
        ORDER BY type_a, type_b
    """,
    tags=("events", "sessions", "association"),
)
def events_session_cooccurrence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Within-session event-type co-occurrence lift (30-minute-gap
    sessions, the events_sessionization construction): for each type
    pair, how many sessions contain both, and the lift over
    independence (P(a,b) / (P(a)P(b)) in 1e-4 fixed point). Lift well
    above 1e4 marks behaviors that travel together inside one visit —
    the session-level rung of the association family
    (order-level: basket_pair_cooccurrence; document-level:
    text_cooccurrence_lift).

    Scale shape: sessionization shuffles once on user_id (both window
    passes reuse the partitioning); the distinct (session, type)
    relation is bounded by sessions x |types|, and the pair self-join
    runs inside each session key — candidate volume is sessions x
    C(|types|, 2), never raw events squared.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)
    st = (
        ev.withColumn(
            "ns", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .withColumn(
            "sid",
            F.sum("ns").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select("user_id", "sid", "event_type")
        .distinct()
        .persist()  # totals, margins, and the pair join all read it
    )
    tot = st.select("user_id", "sid").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    na = st.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = st.alias("a")
    b = st.alias("b")
    p = (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.sid") == F.col("a.sid"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    na1 = na.select(F.col("event_type").alias("type_a"), F.col("c").alias("n_a"))
    na2 = na.select(F.col("event_type").alias("type_b"), F.col("c").alias("n_b"))
    return (
        p.join(F.broadcast(na1), "type_a")
        .join(F.broadcast(na2), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr("(n_ab * n_sessions * 10000) div (n_a * n_b)")
            .cast("long")
            .alias("lift4"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# events_ab_srm_guardrail
# ---------------------------------------------------------------------------


@register(
    "events_ab_srm_guardrail",
    oracle="""
        WITH u AS (
            SELECT DISTINCT user_id,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
                        AS BIGINT) % 2 AS arm
            FROM events
        ),
        c AS (
            SELECT CAST(count(*) AS BIGINT) AS n_users,
                   CAST(count_if(arm = 0) AS BIGINT) AS n_a,
                   CAST(count_if(arm = 1) AS BIGINT) AS n_b
            FROM u
        )
        SELECT n_users, n_a, n_b,
               CAST(((n_a - n_b) * (n_a - n_b) * 10000) // n_users
                    AS BIGINT) AS chi24,
               CAST(CASE WHEN ((n_a - n_b) * (n_a - n_b) * 10000)
                              // n_users <= 38400
                         THEN 1 ELSE 0 END AS BIGINT) AS srm_pass
        FROM c
    """,
    tags=("events", "experimentation", "guardrail"),
)
def events_ab_srm_guardrail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample Ratio Mismatch guardrail for a hash-bucketed 50/50 A/B
    split (arm = md5(user_id) first 16 bits mod 2 — the deterministic
    assignment events_ab_test_analysis uses conceptually): chi-square
    of the observed arm sizes against the designed split. For a 2-arm
    50/50 design the statistic collapses to (n_a - n_b)^2 / n, kept
    in 1e-4 fixed point; srm_pass compares it to the 3.84 critical
    value (alpha = 0.05, 1 df). A failing SRM means the assignment or
    logging is broken and every downstream effect estimate is invalid
    — the first line of any experiment readout.

    Scale shape: one distinct over users (map-side partial), one
    count rollup; the chi-square is scalar arithmetic on a 1-row
    aggregate.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    u = ev.select(
        "user_id",
        (
            F.expr(
                "conv(substring(md5(cast(user_id as string)), 1, 4), 16, 10)"
            ).cast("long")
            % 2
        ).alias("arm"),
    ).distinct()
    c = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    return c.select(
        "n_users",
        "n_a",
        "n_b",
        F.expr("((n_a - n_b) * (n_a - n_b) * 10000) div n_users")
        .cast("long")
        .alias("chi24"),
        (
            F.expr("((n_a - n_b) * (n_a - n_b) * 10000) div n_users")
            <= F.lit(38400)
        )
        .cast("long")
        .alias("srm_pass"),
    )
