"""Round-12 batch 246: corpus-coverage estimation, session path
mining, df-cap economics, capture-recapture cardinality auditing,
and a k-sample matched binary test.

* ``corpus_coverage_estimators`` — Chao2 richness and Good-Turing
  sample coverage over per-document-distinct 3-gram shingle
  incidences: how many distinct shingles the corpus has NOT yet
  shown, and what fraction of the incidence mass the observed
  vocabulary covers — the "is more data worth scraping" number a
  corpus-growth plan starts from.
* ``events_session_path_topk`` — the top-10 opening paths (first 3
  event types) of 30-minute-gap sessions, the funnel-path-mining
  counterpart of events_sessionization.
* ``text_shingle_df_cap_audit`` — document-frequency band histogram
  of the shingle posting list against the engine's NGRAM_DF_CAP:
  how many shingles and postings each df band holds and which bands
  the cap drops — the measured cost of the stop-shingle knob every
  near-dup operator shares.
* ``sample_capture_recapture_audit`` — Chapman mark-recapture
  estimate of the distinct-shingle count from two independent
  deterministic hash samples, audited against the exact count.
* ``stats_cochran_q`` — Cochran's Q for k=3 matched binary
  treatments (did the user click / purchase / error at least once),
  blocks = users; the k-sample extension of McNemar that closes the
  paired-binary-test gap in the statistics family.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B statistics
closure plus LLM-corpus growth/dedup-knob economics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import SQL_TOKENS, shingles, sql_shingles, tokens
from kafkastreamer_spark.operators.dedup import NGRAM_DF_CAP
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# Shared posting-list head: per-document DISTINCT 3-gram shingles,
# exploded to (sh, doc) incidences, then df per shingle. The same
# derivation the near-dup family uses (operators/dedup.py
# _shingle_sets), kept join-free here — both batch-246 consumers
# aggregate it straight down to bounded reports.
_SQL_DF = f"""
    WITH words AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
    sh AS (
        SELECT doc_id, unnest({sql_shingles("w")}) AS s
        FROM words WHERE len(w) >= 3
    ),
    df AS (
        SELECT s, CAST(count(*) AS BIGINT) AS df
        FROM sh GROUP BY s
    )
"""


def _shingle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = widen(load_table(spark, sf_dir, "documents"))
    sh = (
        d.select("doc_id", tokens("text").alias("w"))
        .select("doc_id", F.explode(shingles(F.col("w"))).alias("s"))
    )
    return sh.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("df"))


# ---------------------------------------------------------------------------
# corpus_coverage_estimators
# ---------------------------------------------------------------------------


@register(
    "corpus_coverage_estimators",
    oracle=f"""
        {_SQL_DF},
        freq AS (
            SELECT CAST(count(*) AS BIGINT) AS s_obs,
                   CAST(count_if(df = 1) AS BIGINT) AS f1,
                   CAST(count_if(df = 2) AS BIGINT) AS f2,
                   CAST(sum(df) AS BIGINT) AS n_postings
            FROM df
        ),
        m AS (SELECT CAST(count(*) AS BIGINT) AS m_docs FROM documents)
        SELECT m.m_docs, freq.n_postings, freq.s_obs, freq.f1, freq.f2,
               freq.s_obs + (freq.f1 * (freq.f1 - 1))
                   // (2 * (freq.f2 + 1)) AS chao2_est,
               10000 - (10000 * freq.f1) // freq.n_postings AS coverage4
        FROM freq CROSS JOIN m
    """,
    tags=("llm-data", "text", "coverage", "statistics"),
)
def corpus_coverage_estimators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unseen-vocabulary estimation over 3-gram shingle incidences
    (per-doc distinct, the near-dup family's posting domain): Chao2
    richness — observed distinct shingles plus the bias-corrected
    singleton/doubleton extrapolation f1(f1-1)/(2(f2+1)) — and
    Good-Turing sample coverage 1 - f1/N (the share of the next
    incidence expected to be an already-seen shingle). Both answer
    the corpus-growth question ("how much novel text is left in this
    source?") that novelty curves (text_ngram_novelty_curve) measure
    empirically, from a single snapshot instead of a growth sweep.
    The classic (m-1)/m Chao2 factor is dropped (≈1 for any corpus;
    keeps every term a single floor division, exact cross-engine).

    Scale shape: one corpus-sized shuffle keyed by shingle (map-side
    combined), then two global aggregates folded into a 1-row report
    via broadcast cross joins — no joins over unaggregated rows.
    """
    df = _shingle_df(spark, sf_dir)
    freq = df.agg(
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.count_if(F.col("df") == 1).cast("long").alias("f1"),
        F.count_if(F.col("df") == 2).cast("long").alias("f2"),
        F.sum("df").cast("long").alias("n_postings"),
    )
    m = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("long").alias("m_docs")
    )
    return freq.crossJoin(F.broadcast(m)).select(
        "m_docs",
        "n_postings",
        "s_obs",
        "f1",
        "f2",
        F.expr("s_obs + (f1 * (f1 - 1)) div (2 * (f2 + 1))").alias("chao2_est"),
        F.expr("10000 - (10000 * f1) div n_postings").alias("coverage4"),
    )


# ---------------------------------------------------------------------------
# text_shingle_df_cap_audit
# ---------------------------------------------------------------------------

# power-of-two df bands; the top band starts past the engine's
# stop-shingle cap so "retained" is a whole-band property
assert NGRAM_DF_CAP == 64, "band ladder below is written for cap=64"
_BAND_CASE = """
    CASE WHEN df = 1 THEN 1 WHEN df = 2 THEN 2
         WHEN df <= 4 THEN 3 WHEN df <= 8 THEN 5
         WHEN df <= 16 THEN 9 WHEN df <= 32 THEN 17
         WHEN df <= 64 THEN 33 ELSE 65 END
"""


@register(
    "text_shingle_df_cap_audit",
    oracle=f"""
        {_SQL_DF},
        banded AS (
            SELECT {_BAND_CASE} AS band_lo, df
            FROM df
        )
        SELECT CAST(band_lo AS BIGINT) AS band_lo,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(df) AS BIGINT) AS n_postings,
               CAST(CASE WHEN band_lo <= {NGRAM_DF_CAP} THEN 1 ELSE 0 END
                    AS BIGINT) AS retained
        FROM banded GROUP BY band_lo ORDER BY band_lo
    """,
    tags=("llm-data", "text", "dedup", "audit"),
)
def text_shingle_df_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economics of the stop-shingle cap: document-frequency band
    histogram (power-of-two bands keyed by their lower bound) of the
    3-gram posting list, with each band marked retained/dropped under
    the engine's NGRAM_DF_CAP. The dropped bands' n_postings is the
    exact inverted-index mass the cap saves the near-dup joins — and
    the n_shingles it costs is the recall exposure the cap trades for
    it (a boilerplate shingle in >cap docs never joins its docs).
    Complements dedup_lsh_recall_audit, which measures the resulting
    end-to-end recall; this query attributes it to df bands.

    Scale shape: the shared shingle-df shuffle (map-side combined)
    then an 8-row band rollup — no joins, nothing driver-side.
    """
    df = _shingle_df(spark, sf_dir)
    banded = df.select(F.expr(_BAND_CASE).alias("band_lo"), "df")
    return (
        banded.groupBy("band_lo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum("df").cast("long").alias("n_postings"),
        )
        .select(
            F.col("band_lo").cast("long"),
            "n_shingles",
            "n_postings",
            F.when(F.col("band_lo") <= NGRAM_DF_CAP, 1)
            .otherwise(0)
            .cast("long")
            .alias("retained"),
        )
        .orderBy("band_lo")
    )


# ---------------------------------------------------------------------------
# events_session_path_topk
# ---------------------------------------------------------------------------


@register(
    "events_session_path_topk",
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                             OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, event_type, ts, event_id,
                   SUM(new_session) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                       AS session_id
            FROM flagged
        ),
        stepped AS (
            SELECT user_id, session_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                        ORDER BY ts, event_id) AS step
            FROM sessions
        ),
        paths AS (
            SELECT concat_ws('>',
                       MAX(CASE WHEN step = 1 THEN event_type END),
                       MAX(CASE WHEN step = 2 THEN event_type END),
                       MAX(CASE WHEN step = 3 THEN event_type END)) AS path
            FROM stepped WHERE step <= 3
            GROUP BY user_id, session_id
        )
        SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 10
    """,
    tags=("events", "session", "path-mining", "top-k"),
)
def events_session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 opening paths of 30-minute-gap sessions: the first three
    event types of each session (same gap rule, same (ts, event_id)
    total order as events_sessionization) joined with '>' — the
    path-mining view of session behavior that tells you WHICH funnel
    to instrument, where the funnel queries assume one.

    Scale shape: one shuffle on user_id reused by both window passes
    (gap flag + running session id) and the per-session step rank;
    paths aggregate to a ≤5³+5²+5-row domain before the global top-10
    (n DESC, path tie-break — a total order, so LIMIT is
    deterministic cross-engine).
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    stepped = sessions.withColumn(
        "step",
        F.row_number().over(
            Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
        ),
    ).filter(F.col("step") <= 3)
    paths = stepped.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.max(F.when(F.col("step") == 1, F.col("event_type"))),
            F.max(F.when(F.col("step") == 2, F.col("event_type"))),
            F.max(F.when(F.col("step") == 3, F.col("event_type"))),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# sample_capture_recapture_audit
# ---------------------------------------------------------------------------

# hex-head-of-md5 bucket in [0, 10): the engine's standard
# deterministic sampling idiom (DuckDB needs the '0x'-prefix cast;
# Spark uses conv(base 16)). Two INDEPENDENT frames via a salt.
_CR_SQL_BUCKET = "CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT) % 10"


@register(
    "sample_capture_recapture_audit",
    oracle=f"""
        {_SQL_DF},
        marked AS (
            SELECT {_CR_SQL_BUCKET.format(expr="s")} = 0 AS in1,
                   {_CR_SQL_BUCKET.format(expr="'cr2_' || s")} = 0 AS in2
            FROM df
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS s_true,
                   CAST(count_if(in1) AS BIGINT) AS n1,
                   CAST(count_if(in2) AS BIGINT) AS n2,
                   CAST(count_if(in1 AND in2) AS BIGINT) AS m_overlap
            FROM marked
        )
        SELECT s_true, n1, n2, m_overlap,
               ((n1 + 1) * (n2 + 1)) // (m_overlap + 1) - 1 AS chapman_est,
               (10000 * (((n1 + 1) * (n2 + 1)) // (m_overlap + 1) - 1
                         - s_true)) // s_true AS err4
        FROM s
    """,
    tags=("llm-data", "sampling", "cardinality", "audit"),
)
def sample_capture_recapture_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mark-recapture cardinality estimation, audited against truth:
    two independent 10%% deterministic hash samples of the distinct
    3-gram shingle population (capture 1 = md5 head bucket 0,
    capture 2 = salted md5 head bucket 0) feed the Chapman
    estimator (n1+1)(n2+1)/(m+1) - 1 for the total distinct count —
    the two-frames cousin of corpus_coverage_estimators' Chao2
    (singleton-abundance extrapolation) and of the HLL sketch
    (agg_loglog_cardinality_audit): estimate distinct volume from
    samples when a full distinct pass is the thing you are trying to
    avoid. err4 reports the estimator's signed relative error
    against the exact count this fixture-scale run can still afford.

    Exactness: bucket membership is the engine's standard
    hex-head-of-md5 idiom (identical bits both engines); Chapman is
    one floor division, err4 a second on integers.

    Scale shape: the shared shingle-df shuffle, then a single
    4-counter global aggregate — 1-row output, no joins. At 100 TB
    the df relation drops out: the two captures hash raw postings and
    dedup only the ~20%% sampled slice.
    """
    df = _shingle_df(spark, sf_dir)
    b1 = F.conv(F.substring(F.md5(F.col("s")), 1, 8), 16, 10).cast("long") % 10
    b2 = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("cr2_"), F.col("s"))), 1, 8), 16, 10
        ).cast("long")
        % 10
    )
    s = df.select((b1 == 0).alias("in1"), (b2 == 0).alias("in2")).agg(
        F.count(F.lit(1)).cast("long").alias("s_true"),
        F.count_if(F.col("in1")).cast("long").alias("n1"),
        F.count_if(F.col("in2")).cast("long").alias("n2"),
        F.count_if(F.col("in1") & F.col("in2")).cast("long").alias("m_overlap"),
    )
    return s.select(
        "s_true",
        "n1",
        "n2",
        "m_overlap",
        F.expr("((n1 + 1) * (n2 + 1)) div (m_overlap + 1) - 1").alias(
            "chapman_est"
        ),
        F.expr(
            "(10000 * (((n1 + 1) * (n2 + 1)) div (m_overlap + 1) - 1 - s_true))"
            " div s_true"
        ).alias("err4"),
    )


# ---------------------------------------------------------------------------
# stats_cochran_q
# ---------------------------------------------------------------------------

_Q_TYPES = ("click", "purchase", "error")


@register(
    "stats_cochran_q",
    oracle=f"""
        WITH blocks AS (
            SELECT user_id,
                   CAST(CASE WHEN count_if(event_type = '{_Q_TYPES[0]}') > 0
                        THEN 1 ELSE 0 END AS BIGINT) AS x1,
                   CAST(CASE WHEN count_if(event_type = '{_Q_TYPES[1]}') > 0
                        THEN 1 ELSE 0 END AS BIGINT) AS x2,
                   CAST(CASE WHEN count_if(event_type = '{_Q_TYPES[2]}') > 0
                        THEN 1 ELSE 0 END AS BIGINT) AS x3
            FROM events GROUP BY user_id
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                   CAST(sum(x1) AS BIGINT) AS g1,
                   CAST(sum(x2) AS BIGINT) AS g2,
                   CAST(sum(x3) AS BIGINT) AS g3,
                   CAST(sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT)
                       AS sum_l2,
                   CAST(sum(x1 + x2 + x3) AS BIGINT) AS t
            FROM blocks
        )
        SELECT n_blocks, g1 AS g_{_Q_TYPES[0]}, g2 AS g_{_Q_TYPES[1]},
               g3 AS g_{_Q_TYPES[2]},
               CASE WHEN 3 * t - sum_l2 = 0 THEN CAST(0 AS BIGINT)
                    ELSE (10000 * 2 * (3 * (g1*g1 + g2*g2 + g3*g3) - t*t))
                         // (3 * t - sum_l2)
               END AS q_fp4
        FROM s
    """,
    tags=("statistics", "hypothesis-test", "events"),
)
def stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q for k=3 matched binary treatments — did each user
    (block) click / purchase / error at least once — testing whether
    the three participation rates differ beyond what per-user
    correlation explains. The k-sample extension of McNemar closing
    the paired-binary gap next to stats_kruskal_wallis (k-sample
    ranks) and the chi-square tests (unmatched counts): Q =
    (k-1)(kΣG² - T²)/(kT - ΣL²) is asymptotically χ²(k-1=2). Users
    whose three flags are all 0 or all 1 contribute nothing to the
    statistic (their terms cancel exactly), so including every user
    present in events is harmless and keeps the block rule trivial.

    Exactness: every sum is a small integer; Q is one floor division
    at fp4 (denominator-zero guarded identically both engines).

    Scale shape: one groupBy(user_id) fact shuffle, one global
    5-number aggregate, 1-row output.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    blocks = ev.groupBy("user_id").agg(
        *[
            F.when(F.count_if(F.col("event_type") == t) > 0, 1)
            .otherwise(0)
            .cast("long")
            .alias(f"x{i+1}")
            for i, t in enumerate(_Q_TYPES)
        ]
    )
    ell = F.col("x1") + F.col("x2") + F.col("x3")
    s = blocks.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("x1").cast("long").alias("g1"),
        F.sum("x2").cast("long").alias("g2"),
        F.sum("x3").cast("long").alias("g3"),
        F.sum(ell * ell).cast("long").alias("sum_l2"),
        F.sum(ell).cast("long").alias("t"),
    )
    return s.select(
        "n_blocks",
        F.col("g1").alias(f"g_{_Q_TYPES[0]}"),
        F.col("g2").alias(f"g_{_Q_TYPES[1]}"),
        F.col("g3").alias(f"g_{_Q_TYPES[2]}"),
        F.when(F.expr("3 * t - sum_l2") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "(10000 * 2 * (3 * (g1*g1 + g2*g2 + g3*g3) - t*t))"
                " div (3 * t - sum_l2)"
            ).cast("long")
        )
        .alias("q_fp4"),
    )
