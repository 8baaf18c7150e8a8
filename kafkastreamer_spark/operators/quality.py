"""Corpus-quality operators: repetition metrics (Gopher-style), C4-style
global line dedup, and quantile-based quality filtering.

These are north-star training-data extensions (SURVEY.md §2-B); the
reference has no text-quality surface (its operator set is the keyed
arithmetic stages, Streamer.java:443-466).

Determinism: every ratio threshold is evaluated by integer
cross-multiplication (``10*top > n`` instead of ``top/n > 0.1``) so no
float division enters the comparison; every tie is broken by a total
order (doc_id, line index).

Scale shape:

* repetition metrics — one explode + one (doc_id, gram) shuffle; the
  gram stream is map-side combined, so the exchange carries one row
  per *distinct* gram per doc, not one per occurrence. At 100 TB this
  is the same shape as a word-count: embarrassingly parallel.
* line dedup — the dedup decision shuffles md5(line) (32-byte keys),
  never full text; reconstruction reuses the doc_id partitioning of
  the pre-exploded rows. Two shuffles total, both on compact keys.
* quantile filter — one window per language partition; languages are
  few but large, so the per-lang partitions are the natural skew
  concern — the rank only needs (lang, n_chars, doc_id), 20 bytes/row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreamer_spark.operators.deskew import bucketed_row_number, md5_ranked
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

LINE_TOKENS = 5  # tokens per "line" for global line dedup


_REPETITION_ORACLE = """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
            SELECT doc_id, 2 AS g, t[i] || ' ' || t[i+1] AS gram, len(t) AS n
            FROM toks, unnest(range(1, len(t))) AS u(i)
            UNION ALL
            SELECT doc_id, 3, t[i] || ' ' || t[i+1] || ' ' || t[i+2], len(t)
            FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
        ),
        c AS (
            SELECT doc_id, g, gram, any_value(n) AS n, count(*) AS c
            FROM grams GROUP BY doc_id, g, gram
        ),
        m AS (
            SELECT doc_id,
                   any_value(n) AS n_tokens,
                   max(CASE WHEN g = 2 THEN c END) AS top_bigram_count,
                   CAST(coalesce(sum(CASE WHEN g = 3 AND c >= 2 THEN c END), 0)
                        AS BIGINT) AS dup_trigram_occurrences,
                   CAST(sum(CASE WHEN g = 3 THEN c END) AS BIGINT) AS n_trigrams
            FROM c GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, top_bigram_count, dup_trigram_occurrences,
               n_trigrams,
               CAST(10 * top_bigram_count > n_tokens
                    OR 2 * dup_trigram_occurrences > n_trigrams AS INT)
                   AS flagged_repetitive
        FROM m ORDER BY doc_id
    """


def repetition_metrics_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered per-doc repetition metrics (shared by the metrics
    query and the corpus-prep capstone)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    d = widen(d)
    grams = d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.explode(
            F.concat(
                # size guards: sequence(0, -1) DESCENDS and indexes
                # toks[-1] (ArrayIndexOutOfBounds on a 1-token doc) —
                # same latent crash fixed in with_repetition_flag
                F.expr(
                    "CASE WHEN size(toks) >= 2 THEN"
                    " transform(sequence(0, size(toks)-2),"
                    " i -> struct(2 as g, concat(toks[i], ' ', toks[i+1]) as gram))"
                    " ELSE array() END"
                ),
                F.expr(
                    "CASE WHEN size(toks) >= 3 THEN"
                    " transform(sequence(0, size(toks)-3),"
                    " i -> struct(3 as g,"
                    " concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]) as gram))"
                    " ELSE array() END"
                ),
            )
        ).alias("e"),
    )
    counts = grams.groupBy(
        "doc_id", F.col("e.g").alias("g"), F.col("e.gram").alias("gram")
    ).agg(F.max("n_tokens").alias("n"), F.count(F.lit(1)).alias("c"))
    m = counts.groupBy("doc_id").agg(
        F.max("n").alias("n_tokens"),
        F.max(F.when(F.col("g") == 2, F.col("c"))).alias("top_bigram_count"),
        F.coalesce(
            F.sum(F.when((F.col("g") == 3) & (F.col("c") >= 2), F.col("c"))),
            F.lit(0),
        )
        .cast("long")
        .alias("dup_trigram_occurrences"),
        F.sum(F.when(F.col("g") == 3, F.col("c"))).cast("long").alias("n_trigrams"),
    )
    return m.select(
        "doc_id",
        "n_tokens",
        "top_bigram_count",
        "dup_trigram_occurrences",
        "n_trigrams",
        (
            (10 * F.col("top_bigram_count") > F.col("n_tokens"))
            | (2 * F.col("dup_trigram_occurrences") > F.col("n_trigrams"))
        )
        .cast("int")
        .alias("flagged_repetitive"),
    )


@register(
    "text_repetition_metrics",
    oracle=_REPETITION_ORACLE,
    tags=("text", "quality", "training-data"),
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: per document, the occurrence
    count of the most frequent bigram and the number of trigram
    occurrences belonging to repeated trigrams. A doc is flagged when
    the top bigram covers >10% of tokens or >50% of its trigrams are
    duplicates — thresholds evaluated in integer space
    (10*top > n, 2*dup > total) so the flag is engine-exact.

    Both gram orders ride ONE explode and ONE (doc_id, gram) shuffle:
    the bigram and trigram arrays are concatenated (tagged with g=2/3)
    before exploding, and partial aggregation collapses repeats
    map-side."""
    return repetition_metrics_df(spark, sf_dir).orderBy("doc_id")


@register(
    "dedup_lines_global",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        lines AS (
            SELECT doc_id, i AS li,
                   array_to_string(t[(i-1)*{LINE_TOKENS}+1 : i*{LINE_TOKENS}], ' ')
                       AS line
            FROM toks,
                 unnest(range(1, CAST(ceil(len(t) / {LINE_TOKENS}.0) AS INT) + 1))
                     AS u(i)
        ),
        kept AS (
            SELECT doc_id, li, line,
                   row_number() OVER (PARTITION BY md5(line)
                                      ORDER BY doc_id, li) AS rk
            FROM lines
        ),
        rebuilt AS (
            SELECT doc_id,
                   count(*) FILTER (WHERE rk = 1) AS n_lines_kept,
                   count(*) AS n_lines_total,
                   coalesce(string_agg(line, ' ' ORDER BY li)
                                FILTER (WHERE rk = 1), '')
                       AS clean_text
            FROM kept GROUP BY doc_id
        )
        SELECT doc_id, n_lines_kept, n_lines_total, md5(clean_text) AS clean_fp
        FROM rebuilt ORDER BY doc_id
    """,
    tags=("dedup", "text", "training-data"),
)
def dedup_lines_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global line deduplication: split every document into
    consecutive 5-token lines, keep each distinct line's FIRST
    occurrence corpus-wide (ordered by doc_id, then position), drop
    every other copy, and reassemble the documents. Output is the
    per-doc kept/total line counts and an md5 fingerprint of the
    cleaned text (so the comparison payload stays 32 bytes however
    long the document is).

    The global first-occurrence decision is a window over md5(line) —
    the shuffle carries 32-byte digests + two small ints, never the
    line text twice. Reconstruction groups by doc_id and re-sorts the
    few surviving lines per doc inside the aggregate
    (``array_sort(collect_list(struct(li, line)))``), avoiding a
    second global sort."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    d = widen(d)
    n_lines = F.ceil(F.size("toks") / F.lit(float(LINE_TOKENS))).cast("int")
    lines = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n_lines)).alias("li"),
        "toks",
    ).select(
        "doc_id",
        "li",
        F.array_join(
            F.slice(F.col("toks"), (F.col("li") - 1) * LINE_TOKENS + 1, LINE_TOKENS),
            " ",
        ).alias("line"),
    )
    w = Window.partitionBy(F.md5("line")).orderBy("doc_id", "li")
    kept = lines.select(
        "doc_id", "li", "line", F.row_number().over(w).alias("rk")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.when(F.col("rk") == 1, 1)).alias("n_lines_kept"),
        F.count(F.lit(1)).alias("n_lines_total"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rk") == 1, F.struct("li", "line")
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("clean_text"),
    )
    return rebuilt.select(
        "doc_id",
        "n_lines_kept",
        "n_lines_total",
        F.md5("clean_text").alias("clean_fp"),
    ).orderBy("doc_id")


@register(
    "sample_quality_quantile",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, lang, n_chars,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n_chars DESC,
                                               md5(CAST(doc_id AS VARCHAR)),
                                               doc_id) AS rk,
                   count(*) OVER (PARTITION BY lang) AS cnt
            FROM documents
        )
        SELECT doc_id, lang, n_chars
        FROM ranked WHERE 4 * rk <= cnt
        ORDER BY lang, doc_id
    """,
    tags=("sampling", "quality", "training-data"),
)
def sample_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based quality gate: keep the top quartile of documents
    by n_chars *within each language* (per-stratum quantiles, so a
    verbose language doesn't crowd out a terse one). The quartile
    membership test is the integer comparison ``4*rank <= count`` on
    an exactly-ranked window — no percentile interpolation, no
    floats, identical on any engine and any partitioning. Length ties
    break by md5(doc_id) (then doc_id) — deterministic, and it makes
    the de-skew bucket robust below.

    Scale shape: the de-skew bucket is (-n_chars, md5(doc_id) 2-hex
    prefix) — a true prefix of the sort key (n_chars DESC, md5,
    doc_id). Bucketing by length alone only fans a dominant language
    across its length *distribution*; when most documents share one
    length that single (lang, n_chars) bucket would still sort in one
    task, so the uniform md5 sub-bucket splits it a further 256 ways
    regardless of the length histogram. The per-bucket counts
    aggregate joins back as rank offsets (AQE broadcasts it when
    small). Bit-identical to the oracle's global window."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    sub = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    ranked = bucketed_row_number(
        d.select("doc_id", "lang", "n_chars"),
        ["lang"],
        F.struct((-F.col("n_chars")).alias("b0"), sub.alias("b1")),
        [h.asc(), F.col("doc_id").asc()],
        "rk",
        count_name="cnt",
    )
    return (
        ranked.filter(4 * F.col("rk") <= F.col("cnt"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("lang", "doc_id")
    )


def _corpus_prep_ctes() -> str:
    from kafkastreamer_spark.operators.sampling import (
        SOURCE_CAP,
        TEMP_C,
        sql_hash_bucket,
    )

    return f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
            SELECT doc_id, 2 AS g, t[i] || ' ' || t[i+1] AS gram, len(t) AS n
            FROM toks, unnest(range(1, len(t))) AS u(i)
            UNION ALL
            SELECT doc_id, 3, t[i] || ' ' || t[i+1] || ' ' || t[i+2], len(t)
            FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
        ),
        c AS (
            SELECT doc_id, g, gram, any_value(n) AS n, count(*) AS c
            FROM grams GROUP BY doc_id, g, gram
        ),
        flags AS (
            SELECT doc_id,
                   CAST(10 * max(CASE WHEN g = 2 THEN c END) > any_value(n)
                        OR 2 * coalesce(sum(CASE WHEN g = 3 AND c >= 2
                                             THEN c END), 0)
                            > sum(CASE WHEN g = 3 THEN c END) AS INT) AS flagged
            FROM c GROUP BY doc_id
        ),
        clean AS (
            SELECT d.* FROM documents d JOIN flags f USING (doc_id)
            WHERE f.flagged = 0
        ),
        deduped AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                             ORDER BY doc_id) AS rn
                FROM clean
            ) WHERE rn = 1
        ),
        capped AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS crn
                FROM deduped
            ) WHERE crn <= {SOURCE_CAP}
        ),
        mixed AS (
            SELECT * FROM (
                SELECT *,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS lrn,
                       COUNT(*) OVER (PARTITION BY lang) AS lcnt
                FROM capped
            ) WHERE lrn <= least(lcnt,
                    CAST(floor(sqrt(CAST(lcnt AS DOUBLE)) * {TEMP_C}) AS BIGINT))
        )
        SELECT 1 AS _one
    """


def _corpus_prep_oracle() -> str:
    from kafkastreamer_spark.operators.sampling import sql_hash_bucket

    body = _corpus_prep_ctes()
    body = body[: body.rindex("SELECT 1 AS _one")]
    return (
        body
        + f"""
        SELECT CASE WHEN {sql_hash_bucket("doc_id")} < 80 THEN 'train'
                    WHEN {sql_hash_bucket("doc_id")} < 90 THEN 'valid'
                    ELSE 'test' END AS split,
               lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM mixed
        GROUP BY split, lang
        ORDER BY split, lang
    """
    )


def _corpus_prep_waterfall_oracle() -> str:
    body = _corpus_prep_ctes()
    body = body[: body.rindex("SELECT 1 AS _one")]
    return (
        body
        + """, ladder AS (
            SELECT 0 AS stage, 'input' AS stage_name,
                   (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_out
            UNION ALL SELECT 1, 'repetition_filter',
                   (SELECT CAST(count(*) AS BIGINT) FROM clean)
            UNION ALL SELECT 2, 'exact_dedup',
                   (SELECT CAST(count(*) AS BIGINT) FROM deduped)
            UNION ALL SELECT 3, 'source_cap',
                   (SELECT CAST(count(*) AS BIGINT) FROM capped)
            UNION ALL SELECT 4, 'temperature_mix',
                   (SELECT CAST(count(*) AS BIGINT) FROM mixed)
        )
        SELECT stage, stage_name, n_out,
               CAST(coalesce(lag(n_out) OVER (ORDER BY stage), n_out)
                    - n_out AS BIGINT) AS n_dropped,
               (10000 * (coalesce(lag(n_out) OVER (ORDER BY stage), n_out)
                         - n_out))
                   // coalesce(lag(n_out) OVER (ORDER BY stage), n_out)
                   AS drop_pct4
        FROM ladder ORDER BY stage
    """
    )


def _corpus_prep_stages(spark: SparkSession, sf_dir: str) -> dict:
    """The corpus-prep hygiene chain as named stage DataFrames —
    shared verbatim by the capstone report (pipeline_corpus_prep) and
    the waterfall audit so the two can never drift apart."""
    from kafkastreamer_spark.operators.sampling import SOURCE_CAP, TEMP_C

    flags = repetition_metrics_df(spark, sf_dir).select(
        "doc_id", "flagged_repetitive"
    )
    d = load_table(spark, sf_dir, "documents")
    # Round-7 note: swapping this join for the map-only
    # with_repetition_flag was MEASURED 10x slower here (43 s vs 4 s
    # at sf0.01 in the driver-sim flow): the flag's O(distinct x n)
    # per-row counting lambdas cost more than the explode+groupBy's
    # one exchange at these document lengths. The flag form stays the
    # right trade only where an aggregation is impossible (stateless
    # streaming gates) — keep the join here.
    clean = d.join(flags, "doc_id").filter(F.col("flagged_repetitive") == 0)

    wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        clean.withColumn("rn", F.row_number().over(wdup)).filter(F.col("rn") == 1)
    )

    # Recompute barrier (r13, guide §2.4/§5): the two md5_ranked
    # stages below each reference their input TWICE (counts side +
    # join side) with different projections under the exchanges, so
    # exchange reuse cannot fire and the whole grams -> flags-join ->
    # dedup-window lineage executed up to 4x per action (stage
    # profile: the 16 s-CPU gram aggregation ran as two separate
    # 32-task stages). One persist of the deduped survivors — with
    # `text` projected away first, since nothing above the dedup
    # window reads it — runs the heavy lineage once and caches only
    # the narrow audit columns. Same persist-inside-the-timed-plan
    # protocol as the posting-list persist (bench.py and driver_sim
    # clearCache between queries).
    deduped_slim = deduped.select("doc_id", "lang", "source", "n_chars").persist()

    capped = md5_ranked(deduped_slim, ["source"], "doc_id", "crn").filter(
        F.col("crn") <= SOURCE_CAP
    )

    target = F.least(
        F.col("lcnt"),
        F.floor(F.sqrt(F.col("lcnt").cast("double")) * TEMP_C).cast("long"),
    )
    mixed = md5_ranked(
        capped, ["lang"], "doc_id", "lrn", count_name="lcnt"
    ).filter(F.col("lrn") <= target)
    return {
        "input": d,
        "repetition_filter": clean,
        "exact_dedup": deduped_slim,
        "source_cap": capped,
        "temperature_mix": mixed,
        "mixed": mixed,
    }


@register(
    "pipeline_corpus_prep_waterfall",
    oracle=_corpus_prep_waterfall_oracle(),
    tags=("pipeline", "quality", "reporting", "llm-data"),
)
def pipeline_corpus_prep_waterfall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stage-by-stage waterfall for the corpus-prep capstone: how many
    documents enter, survive and drop at each hygiene gate
    (repetition filter -> exact dedup -> source cap -> temperature
    mix), with the per-stage drop rate — the audit view an ingestion
    review reads BEFORE trusting the final mixture, and the first
    place a mis-tuned gate (a cap set too low, a filter suddenly
    eating 40% of a source) becomes visible. Built on the SAME stage
    DataFrames as pipeline_corpus_prep via _corpus_prep_stages, so
    the waterfall can never disagree with the report it explains.

    Scale shape: one count aggregate per stage over the shared
    lineage (Spark reuses the common shuffle stages across the
    counts via exchange reuse), then a 5-row ladder with one lag
    window."""
    stages = _corpus_prep_stages(spark, sf_dir)
    names = [
        "input",
        "repetition_filter",
        "exact_dedup",
        "source_cap",
        "temperature_mix",
    ]
    ladder = None
    for i, nm in enumerate(names):
        c = stages[nm].agg(
            F.lit(i).cast("long").alias("stage"),
            F.lit(nm).alias("stage_name"),
            F.count(F.lit(1)).cast("long").alias("n_out"),
        )
        ladder = c if ladder is None else ladder.unionByName(c)
    w = Window.orderBy("stage")
    prev = F.coalesce(F.lag("n_out").over(w), F.col("n_out"))
    return ladder.select(
        "stage",
        "stage_name",
        "n_out",
        (prev - F.col("n_out")).cast("long").alias("n_dropped"),
        F.floor(
            (10000 * (prev - F.col("n_out"))).cast("double") / prev
        )
        .cast("long")
        .alias("drop_pct4"),
    ).orderBy("stage")


@register(
    "pipeline_corpus_prep",
    oracle=_corpus_prep_oracle(),
    tags=("pipeline", "quality", "training-data", "flagship"),
)
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-preparation capstone — the full hygiene chain
    a pretraining pipeline runs, composed from this engine's operators
    in their production order:

      1. repetition filter  (drop flagged docs — Gopher rules)
      2. exact dedup        (first copy per md5(text) wins)
      3. per-source cap     (no domain dominates)
      4. temperature mix    (count^0.5 language rebalancing)
      5. deterministic train/valid/test split (md5 buckets 80/10/10)

    reported as per-(split, language) document and character counts.

    Every stage is a deterministic function of content hashes, so the
    final mixture is reproducible across engines, partitionings, and
    reruns end to end — the property that makes a 100 TB corpus build
    auditable. Scale shape: each stage is one narrow-key window or
    join and strictly shrinks the data; the heavy explode (grams)
    happens once, on the raw input, and only (doc_id, flag) survives
    it into the join. The per-source cap and per-language mix ranks
    use ``deskew.md5_ranked`` (md5-prefix buckets + broadcast
    offsets), so no language or domain ever sorts in a single task —
    bit-identical to the oracle's global windows (round-1 `weak`
    fix)."""
    from kafkastreamer_spark.operators.sampling import hash_bucket

    mixed = _corpus_prep_stages(spark, sf_dir)["mixed"]

    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test").alias("split")
    )
    return (
        mixed.select(split, "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("split", "lang")
    )


def with_repetition_flag(
    df: DataFrame, text_col: str = "text", flag_col: str = "flag"
) -> DataFrame:
    """Map-only repetition flag — the streaming-friendly twin of
    ``repetition_metrics_df``.

    The shuffle-based explode+groupBy form scales to arbitrarily long
    documents; this form is per-row O(n log n), zero exchanges,
    usable as a plain stateless filter in a streaming map stage where
    an aggregation would force update-mode state. Same integer
    thresholds; flags are bit-identical to the metrics query FOR DOCS
    WITH >= 2 TOKENS (parity-tested on that domain). The two forms
    necessarily differ on degenerate docs: the metrics query emits no
    row at all for sub-2-token docs (the bigram explode drops them),
    while this flag form emits flag=1 for them — by construction, not
    by accident: a 1-token doc makes the trigram clause
    ``2*dup_tri > n-2`` vacuously true (0 > -1), and any doc under 10
    tokens is flagged by the bigram threshold anyway the moment one
    bigram exists (10*1 > n for n <= 9). A gate built on this flag
    therefore DROPS all tiny docs — the conservative choice for a
    quality filter; pinned in test_repetition_flag_degenerate_docs
    (ADVICE r7: the old blanket "bit-identical" claim was overstated).

    Round-7 rework: the original counted each distinct gram with a
    nested filter — O(distinct·n) per row, measured 43 s over 500
    sf0.01 docs when used in a batch chain. Now each gram array is
    SORTED once and counts come from one run-length fold over the
    sorted array (array_sort + a struct-accumulator aggregate): the
    same counts, two orders cheaper, still whole-stage-codegen
    expression work.

    The gram arrays are materialized as real columns BEFORE the
    folds touch them: an expression referenced inside a
    higher-order-function lambda re-evaluates per element, which
    inflates the complexity class with a giant codegen unit (measured
    ~50x on the fixture) — a column reference is a cheap lookup."""
    staged = (
        df.withColumn("_toks", F.split(text_col, " "))
        .withColumn(
            "_bg",
            # size guard: sequence(0, -1) DESCENDS, so a 1-token doc
            # would index _toks[-1] (latent in the original form too,
            # exposed by the degenerate-doc test)
            F.expr(
                "CASE WHEN size(_toks) >= 2 THEN"
                " array_sort(transform(sequence(0, size(_toks)-2),"
                " i -> concat(_toks[i], ' ', _toks[i+1])))"
                " ELSE array() END"
            ),
        )
        .withColumn(
            "_tg",
            F.expr(
                "CASE WHEN size(_toks) >= 3 THEN"
                " array_sort(transform(sequence(0, size(_toks)-3),"
                " i -> concat(_toks[i], ' ', _toks[i+1], ' ', _toks[i+2])))"
                " ELSE array() END"
            ),
        )
    )

    # One pass over a SORTED gram array: carry (prev, run, best, dup)
    # where `best` is the longest run seen and `dup` the total size of
    # runs >= 2 — closed at each run boundary and once more at the end.
    def _run_stats(col_name: str):
        g = F.col(col_name)
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(0).alias("dup"),
        )

        def step(acc, x):
            same = acc["prev"].isNotNull() & (acc["prev"] == x)
            run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
            closed_dup = F.when(
                ~same & (acc["run"] >= 2), acc["run"]
            ).otherwise(F.lit(0))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
                (acc["dup"] + closed_dup).alias("dup"),
            )

        st = F.aggregate(g, init, step)
        best = st["best"]
        dup = st["dup"] + F.when(st["run"] >= 2, st["run"]).otherwise(F.lit(0))
        return best, dup

    top_bigram, _ = _run_stats("_bg")
    _, dup_tri = _run_stats("_tg")
    n = F.size("_toks")
    flag = ((10 * top_bigram > n) | (2 * dup_tri > (n - 2))).cast("int")
    return staged.withColumn(flag_col, flag).drop("_toks", "_bg", "_tg")


@register(
    "corpus_quality_rollup",
    oracle=f"""
        WITH tok AS (
            SELECT lang, source, {{toks}} AS w,
                   length(text) AS nc,
                   length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
                       AS n_punct
            FROM documents
        ),
        feat AS (
            SELECT lang, source,
                   CAST(len(w) AS BIGINT) AS n_tokens,
                   CAST(FLOOR(CAST(n_punct AS DOUBLE) / nc * 10000) AS BIGINT)
                       AS punct_pct4,
                   CAST(FLOOR(CAST(list_sum(list_transform(w, t -> len(t)))
                        AS DOUBLE) / len(w) * 10000) AS BIGINT) AS avg_token_len4
            FROM tok
        ),
        scored AS (
            SELECT lang, source, n_tokens,
                   (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 40 ELSE 0 END
                    + CASE WHEN punct_pct4 < 500 THEN 30 ELSE 0 END
                    + CASE WHEN avg_token_len4 BETWEEN 30000 AND 80000 THEN 30
                           ELSE 0 END) AS q
            FROM feat
        )
        SELECT lang, source, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(sum(q) AS BIGINT) AS score_sum,
               (CAST(sum(CASE WHEN q >= 70 THEN 1 ELSE 0 END) AS BIGINT)
                    * 10000) // count(*) AS high_quality_bp
        FROM scored GROUP BY lang, source
        ORDER BY lang, source
    """.format(toks="string_split_regex(lower(text), '\\s+')"),
    tags=("llm-data", "quality", "rollup"),
)
def corpus_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus quality dashboard: document counts,
    token totals, summed quality score and the high-quality share in
    basis points — the rollup a data curator reads before choosing
    per-source sampling weights (feeds sample_source_cap /
    sample_temperature_mix).  Reuses text_quality_score's scoring
    formula; the share is an integer basis-point division, no float
    ratios.

    Scale shape: scoring is map-only array work; the rollup is one
    shuffle bounded at |langs|×|sources| groups with map-side
    combine."""
    d = widen(load_table(spark, sf_dir, "documents"))
    w = F.col("w")
    nc = F.length("text")
    n_punct = nc - F.length(F.regexp_replace("text", "[^a-z0-9 ]", ""))
    feat = d.select(
        "lang", "source", F.split(F.lower(F.col("text")), r"\s+").alias("w"), "text"
    ).select(
        "lang",
        "source",
        F.size(w).cast("long").alias("n_tokens"),
        F.floor(n_punct.cast("double") / nc * 10000).alias("punct_pct4"),
        F.floor(
            F.aggregate(
                F.transform(w, lambda t: F.length(t).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.size(w)
            * 10000
        ).alias("avg_token_len4"),
    )
    q = (
        F.when(F.col("n_tokens").between(20, 1000), 40).otherwise(0)
        + F.when(F.col("punct_pct4") < 500, 30).otherwise(0)
        + F.when(F.col("avg_token_len4").between(30000, 80000), 30).otherwise(0)
    )
    return (
        feat.select("lang", "source", "n_tokens", q.alias("q"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("q").cast("long").alias("score_sum"),
            F.expr(
                "(cast(sum(case when q >= 70 then 1 else 0 end) as bigint)"
                " * 10000) div count(1)"
            ).alias("high_quality_bp"),
        )
        .orderBy("lang", "source")
    )


_GOPHER_ORACLE = """
        WITH tok AS (
            SELECT doc_id, source,
                   string_split_regex(lower(text), '\\s+') AS w
            FROM documents
        ),
        f AS (
            SELECT doc_id, source,
                   CAST(len(w) AS BIGINT) AS n_words,
                   CAST(list_sum(list_transform(w, t -> len(t))) AS BIGINT)
                       AS total_chars,
                   CAST(len(list_filter(w,
                        t -> t IN ('the','a','and','of','to'))) AS BIGINT)
                       AS n_stop,
                   CAST(len(list_filter(w,
                        t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS n_alpha
            FROM tok
        ),
        r AS (
            SELECT source,
                   CASE WHEN n_words BETWEEN 50 AND 100000
                        THEN 1 ELSE 0 END AS p_wc,
                   CASE WHEN total_chars >= n_words * 3
                         AND total_chars <= n_words * 10
                        THEN 1 ELSE 0 END AS p_mwl,
                   CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS p_stop,
                   CASE WHEN n_alpha * 10 >= n_words * 8
                        THEN 1 ELSE 0 END AS p_alpha
            FROM f
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(p_wc) AS BIGINT) AS pass_word_count,
               CAST(SUM(p_mwl) AS BIGINT) AS pass_mean_word_len,
               CAST(SUM(p_stop) AS BIGINT) AS pass_stopwords,
               CAST(SUM(p_alpha) AS BIGINT) AS pass_alpha_ratio,
               CAST(SUM(p_wc * p_mwl * p_stop * p_alpha) AS BIGINT) AS pass_all
        FROM r GROUP BY source ORDER BY source
    """


@register(
    "quality_gopher_rules",
    oracle=_GOPHER_ORACLE,
    tags=("llm-data", "text", "quality"),
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule battery (Rae et al. 2021, table A1
    shape): per-document pass/fail on word-count band, mean word
    length band, minimum stopword count, and alphabetic-word ratio,
    rolled up to per-source pass rates.

    Every threshold is integer cross-multiplication (``total_chars <=
    n_words * 10`` instead of ``mean <= 10.0``) so the flags are
    bit-identical across engines. Scale shape: one narrow projection
    computes all four flags in a single whole-stage-codegen pass over
    the text column, then a map-side-combined groupBy on ``source``
    (few keys, counts only) — no shuffle carries document bodies.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    w = F.split(F.lower("text"), r"\s+")
    f = d.select(
        "source",
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
    p_wc = F.when(F.col("n_words").between(50, 100000), 1).otherwise(0)
    p_mwl = F.when(
        (F.col("total_chars") >= F.col("n_words") * 3)
        & (F.col("total_chars") <= F.col("n_words") * 10),
        1,
    ).otherwise(0)
    p_stop = F.when(F.col("n_stop") >= 2, 1).otherwise(0)
    p_alpha = F.when(F.col("n_alpha") * 10 >= F.col("n_words") * 8, 1).otherwise(0)
    r = f.select(
        "source",
        p_wc.alias("p_wc"),
        p_mwl.alias("p_mwl"),
        p_stop.alias("p_stop"),
        p_alpha.alias("p_alpha"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("p_wc").cast("long").alias("pass_word_count"),
            F.sum("p_mwl").cast("long").alias("pass_mean_word_len"),
            F.sum("p_stop").cast("long").alias("pass_stopwords"),
            F.sum("p_alpha").cast("long").alias("pass_alpha_ratio"),
            F.sum(
                F.col("p_wc") * F.col("p_mwl") * F.col("p_stop") * F.col("p_alpha")
            )
            .cast("long")
            .alias("pass_all"),
        )
        .orderBy("source")
    )


@register(
    "text_compression_ratio",
    oracle=None,  # zlib is not expressible in DuckDB SQL — rows-only
    tags=("llm-data", "quality", "text"),
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal (the Gopher-family heuristic
    the rule battery in quality_gopher_rules cannot express in pure
    SQL): highly repetitive or templated text compresses far below
    natural prose, so ratio = deflate_bytes/raw_bytes separates
    boilerplate from content. zlib level 6, a deterministic pure
    function of the bytes, evaluated in an Arrow-batched pandas UDF
    (one C call per document, vectorized transfer).

    Rows-only by design: no SQL engine exposes deflate, so the driver
    checks row count/schema and the pytest suite pins the semantics
    (repetitive ≪ diverse, determinism, byte accounting,
    tests/test_compression_ratio.py).

    Scale: map-only projection; CPU-bound and embarrassingly parallel
    exactly like the multimodal decode pass."""
    from pyspark.sql.functions import pandas_udf

    def _zsize_series(texts):  # pd.Series -> pd.Series; the lambda
        # form sidesteps `from __future__ import annotations`, which
        # stringifies hints pandas_udf would otherwise introspect
        import zlib

        return texts.map(lambda t: len(zlib.compress(t.encode("utf-8"), 6)))

    zsize = pandas_udf(_zsize_series, "long")

    d = widen(load_table(spark, sf_dir, "documents"))
    raw = F.length(F.encode("text", "UTF-8")).cast("long")
    return (
        d.select(
            "doc_id",
            raw.alias("n_bytes"),
            zsize("text").alias("n_compressed"),
        )
        .withColumn(
            "ratio4",
            F.floor(
                F.col("n_compressed").cast("double") * 10000 / F.col("n_bytes")
            ).cast("long"),
        )
        .orderBy("doc_id")
    )
