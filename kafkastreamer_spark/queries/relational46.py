"""Round-13 batch 255: image gradient features, chance-corrected
language-ID quality, the above/below-median runs test, and calibration
uncertainty bands.

* ``multimodal_image_gradient_density`` — horizontal + vertical
  gradient-magnitude density over the opaque image payloads
  (row-major 32-wide interpretation): the edge-density feature
  between raw byte stats (multimodal_binary_stats) and perceptual
  hashes (multimodal_image_ahash_pairs), value-checked end-to-end on
  the ASCII fixture bytes.
* ``quality_langid_kappa`` — multiclass Cohen's kappa of the
  stopword language-ID heuristic against the declared lang column:
  the one-number chance-corrected summary of the
  text_langid_confusion matrix (accuracy flatters a classifier when
  one language dominates; kappa doesn't).
* ``stats_runs_above_below`` — Wald–Wolfowitz runs test of monthly
  revenue around its median: too FEW runs = level shifts /
  autocorrelation, too MANY = overdispersed alternation — the
  randomness check beside orders_updown_runs_test (which tests
  direction changes, not level).
* ``ml_calibration_wilson_bands`` — the reliability diagram with a
  95% Wilson score interval per bin: which calibration gaps are
  statistically real given the bin's population, closing the "is bin
  7 actually miscalibrated or just small" question ml_calibration_bins
  leaves open.

Reference parity note: no reference analog (keyed int streamer,
v1/src/main/java/Stream/Streamer.java); SURVEY §2 Part-B multimodal /
text-quality / statistics / ML-evaluation closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators.text import _LANGID_SCORES_SQL, LANG_STOPWORDS
from kafkastreamer_spark.operators._embed import SQL_TOKENS, tokens
from kafkastreamer_spark.queries.relational16 import _PER_USER_SQL, _per_user
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# multimodal_image_gradient_density
# ---------------------------------------------------------------------------

_IMG_W = 32  # row-major image width (bytes per scanline)
_GRAD_T = 16  # |Δ| threshold for a "strong" gradient


@register(
    "multimodal_image_gradient_density",
    oracle=f"""
        WITH samples AS (
            SELECT doc_id, i,
                   ascii(substr(text, CAST(i AS INTEGER), 1)) AS s
            FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
        ),
        grads AS (
            SELECT doc_id,
                   CASE WHEN (i - 1) % {_IMG_W} <> 0
                        THEN abs(s - LAG(s, 1) OVER w) END AS gh,
                   abs(s - LAG(s, {_IMG_W}) OVER w) AS gv
            FROM samples
            WINDOW w AS (PARTITION BY doc_id ORDER BY i)
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(count(gh) AS BIGINT) AS n_h,
                   CAST(count(gv) AS BIGINT) AS n_v,
                   CAST(count_if(gh > {_GRAD_T}) + count_if(gv > {_GRAD_T})
                        AS BIGINT) AS n_strong
            FROM grads GROUP BY doc_id
        )
        SELECT doc_id, n_h, n_v, n_strong,
               (10000 * n_strong) // (n_h + n_v) AS grad_density4
        FROM per_doc WHERE n_h + n_v > 0 ORDER BY doc_id
    """,
    tags=("llm-data", "multimodal", "image"),
)
def multimodal_image_gradient_density(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Edge-density feature per image payload: bytes interpreted as a
    row-major 32-pixel-wide grayscale image; horizontal gradients
    |s_i − s_{i−1}| (skipping scanline seams) and vertical gradients
    |s_i − s_{i−32}|, with the share exceeding |Δ| > 16 as the
    strong-gradient density. The texture/flatness signal an image
    curation pipeline thresholds on (flat = synthetic/empty frames,
    saturated = noise) — sitting between raw byte stats and the
    perceptual aHash. ASCII fixture bytes make the interpretation
    exactly reproducible in SQL (ascii + two lag offsets), so the
    plumbing is value-checked end-to-end; integer arithmetic only.

    Scale shape: one shuffle on doc_id for the sample window (both
    gradient lags reuse it), then a per-doc rollup — no self-joins,
    no pair volume. A real corpus swaps the byte interpretation for
    the image decode at the same batch shape.
    """
    ev = widen(load_table(spark, sf_dir, "documents"))
    # build (doc_id, i, s) without a per-char UDF: split to chars via
    # the between-every-codepoint regex, then posexplode keeps the index
    chars = (
        ev.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), "(?!^)")).alias("pos", "ch"),
        )
        # Spark's split keeps ONE trailing empty element (zero-width
        # match at end-of-string); it is always last, so positions of
        # the real chars are unaffected by dropping it
        .filter(F.col("ch") != "")
        .select("doc_id", (F.col("pos") + 1).alias("i"), F.ascii("ch").alias("s"))
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    gh = F.when(
        (F.col("i") - 1) % _IMG_W != 0, F.abs(F.col("s") - F.lag("s", 1).over(w))
    )
    gv = F.abs(F.col("s") - F.lag("s", _IMG_W).over(w))
    grads = chars.select("doc_id", gh.alias("gh"), gv.alias("gv"))
    per_doc = grads.groupBy("doc_id").agg(
        F.count("gh").cast("long").alias("n_h"),
        F.count("gv").cast("long").alias("n_v"),
        (
            F.count_if(F.col("gh") > _GRAD_T) + F.count_if(F.col("gv") > _GRAD_T)
        )
        .cast("long")
        .alias("n_strong"),
    )
    return (
        per_doc.filter(F.col("n_h") + F.col("n_v") > 0)
        .select(
            "doc_id",
            "n_h",
            "n_v",
            "n_strong",
            F.expr("(10000 * n_strong) div (n_h + n_v)").alias("grad_density4"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# quality_langid_kappa
# ---------------------------------------------------------------------------


@register(
    "quality_langid_kappa",
    oracle=f"""
        WITH {_LANGID_SCORES_SQL.format(toks=SQL_TOKENS)},
        cells AS (
            SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n
            FROM pred GROUP BY 1, 2
        ),
        rt AS (SELECT lang_true AS l, sum(n) AS r FROM cells GROUP BY 1),
        ct AS (SELECT lang_pred AS l, sum(n) AS c FROM cells GROUP BY 1),
        s AS (
            SELECT CAST((SELECT sum(n) FROM cells) AS BIGINT) AS n_docs,
                   CAST((SELECT COALESCE(sum(n), 0) FROM cells
                         WHERE lang_true = lang_pred) AS BIGINT) AS n_agree,
                   CAST((SELECT sum(rt.r * ct.c)
                         FROM rt JOIN ct ON rt.l = ct.l) AS BIGINT) AS chance
        )
        SELECT n_docs, n_agree,
               CAST(floor(10000.0 * (n_docs * n_agree - chance)
                    / (n_docs * n_docs - chance)) AS BIGINT) AS kappa4
        FROM s WHERE n_docs * n_docs > chance
    """,
    tags=("llm-data", "text", "evaluation"),
)
def quality_langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass Cohen's kappa of the stopword language-ID heuristic
    (same scores, same deterministic en>es>de>fr argmax as
    text_language_id / text_langid_confusion) against the declared
    lang: po = diagonal mass, pe = Σ row·column marginal products,
    kappa = (po − pe)/(1 − pe). Where the confusion matrix shows
    WHERE the classifier errs, kappa says whether it beats chance at
    all once the label mix is accounted for — the number to gate a
    language filter on before running it over 100 TB. One floor over
    an exact-integer rational (n·agree and the marginal product are
    BIGINTs), guarded against the degenerate all-one-language corpus.

    Scale shape: per-row scoring is map-only; the confusion cells,
    marginals, and kappa all live on the |langs|²-bounded rollup.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    w = F.col("w")

    def score(lang: str):
        return (
            F.size(F.filter(w, lambda t: t.isin(*LANG_STOPWORDS[lang])))
            .cast("long")
            .alias(f"s_{lang}")
        )

    scored = d.select("lang", tokens("text").alias("w")).select(
        F.col("lang").alias("lang_true"),
        score("en"),
        score("es"),
        score("de"),
        score("fr"),
    )
    en, es, de, fr = (F.col(f"s_{x}") for x in ("en", "es", "de", "fr"))
    pred = (
        F.when((en >= es) & (en >= de) & (en >= fr), "en")
        .when((es >= de) & (es >= fr), "es")
        .when(de >= fr, "de")
        .otherwise("fr")
    )
    cells = (
        scored.select("lang_true", pred.alias("lang_pred"))
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    cells = cells.persist()  # totals + marginals share it
    rt = cells.groupBy(F.col("lang_true").alias("l")).agg(F.sum("n").alias("r"))
    ct = cells.groupBy(F.col("lang_pred").alias("l")).agg(F.sum("n").alias("c"))
    chance = (
        rt.join(ct, "l")
        .agg(F.sum(F.col("r") * F.col("c")).cast("long").alias("chance"))
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.coalesce(
            F.sum(F.when(F.col("lang_true") == F.col("lang_pred"), F.col("n"))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_agree"),
    )
    return (
        tot.crossJoin(F.broadcast(chance))
        .filter(F.col("n_docs") * F.col("n_docs") > F.col("chance"))
        .select(
            "n_docs",
            "n_agree",
            F.floor(
                10000.0
                * (F.col("n_docs") * F.col("n_agree") - F.col("chance"))
                / (F.col("n_docs") * F.col("n_docs") - F.col("chance"))
            )
            .cast("long")
            .alias("kappa4"),
        )
    )


# ---------------------------------------------------------------------------
# stats_runs_above_below
# ---------------------------------------------------------------------------


@register(
    "stats_runs_above_below",
    oracle="""
        WITH monthly AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS m,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS x
            FROM orders GROUP BY 1
        ),
        med AS (
            SELECT x AS med FROM (
                SELECT x, ROW_NUMBER() OVER (ORDER BY x, m) AS r,
                       count(*) OVER () AS n
                FROM monthly
            ) WHERE r = (n + 1) // 2
        ),
        signed AS (
            SELECT m, CASE WHEN x > med.med THEN 1 ELSE 0 END AS hi
            FROM monthly CROSS JOIN med WHERE x <> med.med
        ),
        flips AS (
            SELECT hi,
                   CASE WHEN hi <> LAG(hi) OVER (ORDER BY m) THEN 1 ELSE 0 END
                       AS flip
            FROM signed
        ),
        s AS (
            SELECT CAST(sum(hi) AS BIGINT) AS n1,
                   CAST(count(*) - sum(hi) AS BIGINT) AS n2,
                   CAST(sum(flip) + 1 AS BIGINT) AS runs
            FROM flips
        )
        SELECT n1 AS n_above, n2 AS n_below, runs AS n_runs,
               CAST(floor(10000.0
                    * (runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                    / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                           / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))))
                    AS BIGINT) AS z4
        FROM s
        WHERE n1 > 0 AND n2 > 0 AND n1 + n2 > 1
          AND 2 * n1 * n2 > n1 + n2
    """,
    tags=("statistics", "timeseries", "randomness"),
)
def stats_runs_above_below(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test of monthly revenue around its median
    (lower median, (x, month) total order; median-equal months are
    discarded — the classical treatment): the run count R against its
    randomness expectation μ = 2n₁n₂/(n₁+n₂) + 1 with the exact
    variance, z = (R − μ)/σ at fp4. Too few runs = level shifts or
    positive autocorrelation (months cluster above/below); too many =
    forced alternation. Complements orders_updown_runs_test, which
    tests DIRECTION changes and misses level persistence entirely.
    All counts are exact integers; z is one floor over the identical
    IEEE expression on both engines, guarded against the degenerate
    one-sided and zero-variance cases.

    Scale shape: the fact table aggregates to the calendar-bounded
    monthly relation first; the median lookup, sign sequence, flip
    window, and the 3-number rollup all run on ≤ a few hundred rows.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("m")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    monthly = monthly.persist()  # median pass + sign pass share it
    wr = Window.orderBy("x", "m")
    ranked = monthly.select(
        "x",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = ranked.filter(F.col("r") == F.expr("(n + 1) div 2")).select(
        F.col("x").alias("med")
    )
    signed = (
        monthly.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("med"))
        .select("m", F.when(F.col("x") > F.col("med"), 1).otherwise(0).alias("hi"))
    )
    wm = Window.orderBy("m")
    flips = signed.select(
        "hi",
        F.when(F.col("hi") != F.lag("hi").over(wm), 1).otherwise(0).alias("flip"),
    )
    s = flips.agg(
        F.sum("hi").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("hi")).cast("long").alias("n2"),
        (F.sum("flip") + 1).cast("long").alias("runs"),
    )
    n1, n2, runs = F.col("n1"), F.col("n2"), F.col("runs")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return s.filter(
        (n1 > 0) & (n2 > 0) & (n1 + n2 > 1) & (2 * n1 * n2 > n1 + n2)
    ).select(
        n1.alias("n_above"),
        n2.alias("n_below"),
        runs.alias("n_runs"),
        F.floor(10000.0 * (runs - mu) / F.sqrt(var)).cast("long").alias("z4"),
    )


# ---------------------------------------------------------------------------
# ml_calibration_wilson_bands
# ---------------------------------------------------------------------------

_Z2 = "3.8416"  # z² for the 95% Wilson interval (z = 1.96)

# identical arithmetic text evaluated by BOTH engines (Spark F.expr and
# DuckDB share the syntax), so the IEEE evaluation order is the same
_WILSON_LO = (
    f"(p + {_Z2}/(2*nn) - sqrt({_Z2}) * sqrt((p*(1-p) + {_Z2}/(4*nn))/nn))"
    f" / (1 + {_Z2}/nn)"
)
_WILSON_HI = (
    f"(p + {_Z2}/(2*nn) + sqrt({_Z2}) * sqrt((p*(1-p) + {_Z2}/(4*nn))/nn))"
    f" / (1 + {_Z2}/nn)"
)


@register(
    "ml_calibration_wilson_bands",
    oracle=f"""
        WITH per_user AS ({_PER_USER_SQL}),
        b AS (
            SELECT least(score, 10) AS bin,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS pos
            FROM per_user GROUP BY 1
        ),
        g AS (
            SELECT bin, n, pos,
                   CAST(n AS DOUBLE) AS nn,
                   CAST(pos AS DOUBLE) / n AS p
            FROM b
        )
        SELECT bin, n AS n_users, pos AS n_pos,
               CAST(1000 * bin AS BIGINT) AS pred_fp4,
               (10000 * pos) // n AS obs_fp4,
               CAST(floor(10000.0 * {_WILSON_LO}) AS BIGINT) AS lo4,
               CAST(floor(10000.0 * {_WILSON_HI}) AS BIGINT) AS hi4,
               CAST(CASE WHEN 1000 * bin >= CAST(floor(10000.0 * {_WILSON_LO})
                                                 AS BIGINT)
                          AND 1000 * bin <= CAST(floor(10000.0 * {_WILSON_HI})
                                                 AS BIGINT)
                         THEN 1 ELSE 0 END AS BIGINT) AS covered
        FROM g ORDER BY bin
    """,
    tags=("ml", "metrics", "calibration"),
)
def ml_calibration_wilson_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram with a 95% Wilson score interval per bin
    (same fixed-width bins and naive p = min(score,10)/10 map as
    ml_calibration_bins): per bin the observed rate, the Wilson
    lower/upper bounds, and whether the predicted probability falls
    inside them — separating the gaps that are statistically real
    from small-bin noise, which the point-estimate reliability
    diagram and both ECE variants cannot do. The Wilson interval is
    the right small-n form (never leaves [0,1], no ±∞ at pos ∈ {{0,
    n}}). Bounds evaluate the IDENTICAL arithmetic text on both
    engines (shared expression string), so the fp4 floors agree
    bit-for-bit; coverage compares the floored integers.

    Scale shape: one groupBy(user_id) fact pass, then an 11-row bin
    rollup — the interval arithmetic is per-bin scalar work.
    """
    pu = _per_user(spark, sf_dir)
    b = pu.groupBy(F.least("score", F.lit(10)).alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    g = b.select(
        "bin",
        "n",
        "pos",
        F.col("n").cast("double").alias("nn"),
        (F.col("pos").cast("double") / F.col("n")).alias("p"),
    )
    lo4 = F.expr(f"CAST(floor(10000.0 * {_WILSON_LO}) AS BIGINT)")
    hi4 = F.expr(f"CAST(floor(10000.0 * {_WILSON_HI}) AS BIGINT)")
    return g.select(
        "bin",
        F.col("n").alias("n_users"),
        F.col("pos").alias("n_pos"),
        (F.lit(1000) * F.col("bin")).cast("long").alias("pred_fp4"),
        F.expr("(10000 * pos) div n").alias("obs_fp4"),
        lo4.alias("lo4"),
        hi4.alias("hi4"),
        F.when(
            ((F.lit(1000) * F.col("bin")) >= lo4)
            & ((F.lit(1000) * F.col("bin")) <= hi4),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("covered"),
    ).orderBy("bin")
