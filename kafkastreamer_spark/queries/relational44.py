"""Round-13 batch 253: paired-binary change testing, vocabulary
richness, audio zero-crossing features, and threshold operating
points.

* ``stats_mcnemar_test`` — McNemar's test on within-user outcome
  flips between the first and second corpus half: the paired 2×2
  companion of stats_sign_test (which tests activity level) for the
  BINARY converter outcome.
* ``text_yule_k_richness`` — Yule's K vocabulary-richness
  characteristic per source: the repeat-rate statistic that is
  text-length-invariant where TTR (text_lexical_diversity) is not.
* ``multimodal_audio_zcr`` — zero-crossing rate over the opaque
  audio payloads (unsigned 8-bit PCM interpretation, midpoint 128):
  the spectral-brightness/voicing feature beside frame energy
  (multimodal_audio_energy) and VAD segments (multimodal_audio_vad),
  value-checked end-to-end because the fixture bytes are ASCII.
* ``ml_balanced_accuracy_youden`` — sensitivity, specificity,
  balanced accuracy, and Youden's J across the integer score
  threshold ladder: the operating-point table behind
  ml_threshold_cost_curve (which commits to one cost ratio).

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B statistics /
text / multimodal / ML-evaluation closure.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from kafkastreamer_spark.operators._embed import SQL_TOKENS, tokens
from kafkastreamer_spark.operators.multimodal import _blobs
from kafkastreamer_spark.queries.relational16 import _PER_USER_SQL, _per_user
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# stats_mcnemar_test
# ---------------------------------------------------------------------------


@register(
    "stats_mcnemar_test",
    oracle="""
        WITH anchor AS (
            SELECT epoch_us(min(ts)) + epoch_us(max(ts)) AS mid2 FROM events
        ),
        per_user AS (
            SELECT user_id,
                   CASE WHEN count_if(event_type = 'purchase'
                                      AND 2 * epoch_us(e.ts) < anchor.mid2)
                             > count_if(event_type = 'error'
                                        AND 2 * epoch_us(e.ts) < anchor.mid2)
                        THEN 1 ELSE 0 END AS y1,
                   CASE WHEN count_if(event_type = 'purchase'
                                      AND 2 * epoch_us(e.ts) >= anchor.mid2)
                             > count_if(event_type = 'error'
                                        AND 2 * epoch_us(e.ts) >= anchor.mid2)
                        THEN 1 ELSE 0 END AS y2
            FROM events e CROSS JOIN anchor GROUP BY user_id, anchor.mid2
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n_users,
                   CAST(count_if(y1 = 0 AND y2 = 0) AS BIGINT) AS n00,
                   CAST(count_if(y1 = 1 AND y2 = 1) AS BIGINT) AS n11,
                   CAST(count_if(y1 = 0 AND y2 = 1) AS BIGINT) AS n01,
                   CAST(count_if(y1 = 1 AND y2 = 0) AS BIGINT) AS n10
            FROM per_user
        )
        SELECT n_users, n00, n11, n01, n10,
               CASE WHEN n01 + n10 > 0 THEN
                   CAST(floor(10000.0 * (n01 - n10) * (n01 - n10)
                        / (n01 + n10)) AS BIGINT) END AS mcnemar4
        FROM s
    """,
    tags=("statistics", "events", "paired"),
)
def stats_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test of converter-status change within users: the
    binary outcome (purchases > errors, the engine's standard y rule)
    evaluated separately on each user's first-half and second-half
    events (the exact 2·epoch_us midpoint anchor every paired test
    shares), cross-tabulated into the paired 2×2, with the McNemar
    statistic (n01 − n10)²/(n01 + n10) on the discordant cells. The
    binary-outcome companion of stats_sign_test: sign tests "did
    activity shift", McNemar tests "did conversion flip" — and only
    the discordant users carry information. NULL statistic when no
    user flips (both engines agree via the guard).

    Scale shape: one conditional groupBy(user_id) fact pass, then a
    5-number global aggregate; the statistic is one guarded floor on
    exact integers.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    anchor = ev.agg(
        (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))).alias("mid2")
    )
    early = 2 * F.unix_micros("ts") < F.col("mid2")
    late = ~early
    is_p = F.col("event_type") == "purchase"
    is_e = F.col("event_type") == "error"
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "mid2")
        .agg(
            F.when(
                F.count_if(is_p & early) > F.count_if(is_e & early), 1
            )
            .otherwise(0)
            .alias("y1"),
            F.when(F.count_if(is_p & late) > F.count_if(is_e & late), 1)
            .otherwise(0)
            .alias("y2"),
        )
    )
    s = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count_if((F.col("y1") == 0) & (F.col("y2") == 0)).cast("long").alias("n00"),
        F.count_if((F.col("y1") == 1) & (F.col("y2") == 1)).cast("long").alias("n11"),
        F.count_if((F.col("y1") == 0) & (F.col("y2") == 1)).cast("long").alias("n01"),
        F.count_if((F.col("y1") == 1) & (F.col("y2") == 0)).cast("long").alias("n10"),
    )
    disc = F.col("n01") + F.col("n10")
    return s.select(
        "n_users",
        "n00",
        "n11",
        "n01",
        "n10",
        F.when(
            disc > 0,
            F.floor(
                10000.0
                * (F.col("n01") - F.col("n10"))
                * (F.col("n01") - F.col("n10"))
                / disc
            ).cast("long"),
        ).alias("mcnemar4"),
    )


# ---------------------------------------------------------------------------
# text_yule_k_richness
# ---------------------------------------------------------------------------


@register(
    "text_yule_k_richness",
    oracle=f"""
        WITH tok AS (
            SELECT source, unnest({SQL_TOKENS}) AS t FROM documents
        ),
        cnt AS (
            SELECT source, t, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY 1, 2
        ),
        per_src AS (
            SELECT source,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(c * c) AS BIGINT) AS s2
            FROM cnt GROUP BY source
        )
        SELECT source, n_tokens, n_types,
               CAST(floor(CAST(s2 - n_tokens AS DOUBLE) / n_tokens
                    * 100000000.0 / n_tokens) AS BIGINT) AS yule_k4
        FROM per_src WHERE n_tokens > 0 ORDER BY source
    """,
    tags=("llm-data", "text", "richness"),
)
def text_yule_k_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K characteristic per source: K = 10⁴·(S₂ − N)/N² with
    N the token occurrences and S₂ = Σ c² over per-token counts — the
    classical repeat-rate measure of vocabulary richness that, unlike
    type-token ratio, does not shrink with text length (Yule 1944).
    Reported at fp4 (yule_k4 = 10⁴·K). High K = a source leaning on
    few tokens — on this fixture's ~31-token vocabulary, K is
    uniformly enormous, which is exactly the degeneracy signal the
    bit-balance audit reads from the other direction. The division
    interleaves (·/N·10⁸/N) so no intermediate exceeds the exact
    double range at any corpus size; both engines run the identical
    IEEE expression.

    Scale shape: token explode → one vocabulary×source groupBy with
    map-side combine → a per-source 3-number rollup. Nothing after
    the count shuffle exceeds |sources| rows.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    cnt = (
        d.select("source", F.explode(tokens("text")).alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_src = cnt.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    return (
        per_src.filter(F.col("n_tokens") > 0)
        .select(
            "source",
            "n_tokens",
            "n_types",
            F.floor(
                (F.col("s2") - F.col("n_tokens")).cast("double")
                / F.col("n_tokens")
                * 100000000.0
                / F.col("n_tokens")
            )
            .cast("long")
            .alias("yule_k4"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# multimodal_audio_zcr
# ---------------------------------------------------------------------------

_ZCR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_crossings", LongType()),
        StructField("zcr4", LongType()),
    ]
)


def _zcr_batches(batches) -> Iterator:
    """Arrow-batched PCM zero-crossing count: bytes as unsigned 8-bit
    samples around the 128 midpoint (fixture blobs are ASCII, so the
    oracle mirrors with ascii(substr(...)))."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            n = int(arr.size)
            if n < 2:
                continue
            pos = arr >= 128
            k = int(np.count_nonzero(np.diff(pos)))
            rows.append((doc_id, n, k, 10000 * k // (n - 1)))
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_samples", "n_crossings", "zcr4"]
        )


@register(
    "multimodal_audio_zcr",
    oracle="""
        WITH samples AS (
            SELECT doc_id, i,
                   CASE WHEN ascii(substr(text, CAST(i AS INTEGER), 1)) >= 128
                        THEN 1 ELSE 0 END AS pos
            FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
        ),
        flips AS (
            SELECT doc_id,
                   CASE WHEN pos <> LAG(pos) OVER (PARTITION BY doc_id
                                                   ORDER BY i)
                        THEN 1 ELSE 0 END AS flip
            FROM samples
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_samples,
               CAST(sum(flip) AS BIGINT) AS n_crossings,
               (10000 * CAST(sum(flip) AS BIGINT)) // (count(*) - 1) AS zcr4
        FROM flips GROUP BY doc_id HAVING count(*) >= 2 ORDER BY doc_id
    """,
    tags=("llm-data", "multimodal", "audio"),
)
def multimodal_audio_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-crossing rate per audio payload: consecutive-sample sign
    changes around the unsigned-8-bit midpoint (s ≥ 128), the classic
    voicing/spectral-brightness feature next to frame energy and VAD.
    On the ASCII fixture blobs the byte interpretation is exactly
    reproducible in SQL (ascii per character + a lag compare), so the
    Arrow path is value-checked end-to-end — integer counting only,
    zcr4 one integer division.

    Scale shape: pure mapInPandas (no shuffle until the output sort);
    numpy diff over the sample array does the crossing count in one
    vectorized pass per blob. A real audio corpus swaps the byte
    interpretation for the codec decode and keeps the batch shape.
    """
    b = _blobs(spark, sf_dir)
    return (
        b.select("doc_id", "payload")
        .mapInPandas(_zcr_batches, schema=_ZCR_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# ml_balanced_accuracy_youden
# ---------------------------------------------------------------------------

_YOUDEN_MAX_T = 10  # threshold ladder t = 0..10 (predict + when score >= t)


@register(
    "ml_balanced_accuracy_youden",
    oracle=f"""
        WITH per_user AS ({_PER_USER_SQL}),
        caps AS (
            SELECT CASE WHEN score > {_YOUDEN_MAX_T} THEN {_YOUDEN_MAX_T}
                        ELSE score END AS s, y
            FROM per_user
        ),
        tot AS (
            SELECT CAST(sum(y) AS BIGINT) AS p,
                   CAST(count(*) - sum(y) AS BIGINT) AS n
            FROM caps
        ),
        ladder AS (SELECT unnest(range(0, {_YOUDEN_MAX_T} + 1)) AS t),
        conf AS (
            SELECT l.t,
                   CAST(count_if(c.s >= l.t AND c.y = 1) AS BIGINT) AS tp,
                   CAST(count_if(c.s < l.t AND c.y = 0) AS BIGINT) AS tn
            FROM ladder l CROSS JOIN caps c GROUP BY l.t
        )
        SELECT t, tp, tn,
               CAST(floor(10000.0 * tp / p) AS BIGINT) AS sens4,
               CAST(floor(10000.0 * tn / n) AS BIGINT) AS spec4,
               CAST(floor(5000.0 * (CAST(tp AS DOUBLE) / p
                                    + CAST(tn AS DOUBLE) / n))
                    AS BIGINT) AS bacc4,
               CAST(floor(10000.0 * (CAST(tp AS DOUBLE) / p
                                     + CAST(tn AS DOUBLE) / n - 1.0))
                    AS BIGINT) AS youden4
        FROM conf CROSS JOIN tot
        WHERE p > 0 AND n > 0 ORDER BY t
    """,
    tags=("ml", "evaluation", "threshold"),
)
def ml_balanced_accuracy_youden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitivity / specificity / balanced accuracy / Youden's J at
    every integer score threshold t = 0..10 (scores capped at 10, the
    calibration family's cap; predict positive when score ≥ t): the
    full operating-point table that locates the Youden-optimal
    threshold — where ml_threshold_cost_curve prices errors with one
    cost ratio, J = sens + spec − 1 is the cost-free summary. All
    ratios are IEEE divisions of exact integer confusion counts,
    floored at fp4 (bacc at 5000·(sens+spec) so no half-unit is
    lost); identical expressions both engines.

    Scale shape: one groupBy(user_id) fact pass, then the 11-row
    threshold ladder joins the capped per-user relation once (the
    conditional-count aggregation collapses it map-side); everything
    downstream is ≤11 rows with a broadcast 1-row total.
    """
    pu = _per_user(spark, sf_dir)
    caps = pu.select(
        F.when(F.col("score") > _YOUDEN_MAX_T, _YOUDEN_MAX_T)
        .otherwise(F.col("score"))
        .alias("s"),
        "y",
    )
    caps = caps.persist()  # totals + ladder join share it
    tot = caps.agg(
        F.sum("y").cast("long").alias("p"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n"),
    )
    ladder = spark.range(0, _YOUDEN_MAX_T + 1).select(F.col("id").alias("t"))
    conf = (
        F.broadcast(ladder)
        .crossJoin(caps)
        .groupBy("t")
        .agg(
            F.count_if((F.col("s") >= F.col("t")) & (F.col("y") == 1))
            .cast("long")
            .alias("tp"),
            F.count_if((F.col("s") < F.col("t")) & (F.col("y") == 0))
            .cast("long")
            .alias("tn"),
        )
    )
    sens = F.col("tp").cast("double") / F.col("p")
    spec = F.col("tn").cast("double") / F.col("n")
    return (
        conf.crossJoin(F.broadcast(tot))
        .filter((F.col("p") > 0) & (F.col("n") > 0))
        .select(
            "t",
            "tp",
            "tn",
            F.floor(10000.0 * sens).cast("long").alias("sens4"),
            F.floor(10000.0 * spec).cast("long").alias("spec4"),
            F.floor(5000.0 * (sens + spec)).cast("long").alias("bacc4"),
            F.floor(10000.0 * (sens + spec - 1.0)).cast("long").alias("youden4"),
        )
        .orderBy("t")
    )
