"""Round-9 batch 232: partition-spec advisor, b-bit MinHash
economics.

* ``layout_partition_advisor`` — the "which partition spec?" table:
  for each candidate partitioning of the documents table it reports
  partition counts, skew, and the 128 MiB-target file economics the
  layout family's compaction/pruning audits assume as given.
* ``dedup_minhash_bbit_audit`` — b-bit MinHash (Li & König): store
  only the low b bits of each signature component and correct the
  collision floor analytically; the audit measures the estimator's
  error against exact Jaccard per b, pricing a 32x->1x signature
  storage reduction.
(A third candidate — bag-of-words Dice near-dup pairs — was built
and measured, then DROPPED: the synthetic documents fixture draws
from a ~31-token vocabulary, so distinct-token SETS are near-identical
corpus-wide and the metric is degenerate here — 1.1M candidate pairs
at sf0.1 with >95% above the 0.6 threshold. A metric that cannot
discriminate on the test corpus earns no registry row.)

Reference parity note: the reference engine computes nothing of this
kind (keyed integer streamer, v1/src/main/java/Stream/Streamer.java);
these belong to the SURVEY §2 Part-B layout/dedup closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.operators._embed import (
    SQL_TOKENS,
    minhash_array,
    sql_minhash_ctes,
    sql_shingles,
)
from kafkastreamer_spark.operators.dedup import (
    MINHASH_BANDS,
    MINHASH_PERMS,
    _shingle_sets,
    band_sigs,
)
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# layout_partition_advisor
# ---------------------------------------------------------------------------

_TARGET_FILE_BYTES = 128 * 1024 * 1024  # the 128 MiB parquet target


@register(
    "layout_partition_advisor",
    oracle=f"""
        WITH keyed AS (
            SELECT spec,
                   CASE spec WHEN 'by_source' THEN source
                             WHEN 'by_lang' THEN lang
                             ELSE source || '|' || lang END AS pkey,
                   n_chars
            FROM documents
            CROSS JOIN (SELECT unnest(['by_source', 'by_lang',
                                       'by_source_lang']) AS spec)
        ),
        parts AS (
            SELECT spec, pkey, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(n_chars) AS BIGINT) AS n_bytes
            FROM keyed GROUP BY spec, pkey
        )
        SELECT spec,
               CAST(count(*) AS BIGINT) AS n_partitions,
               CAST(sum(n_rows) AS BIGINT) AS total_rows,
               CAST(max(n_rows) AS BIGINT) AS max_part_rows,
               CAST((max(n_rows) * count(*) * 10000) // sum(n_rows)
                    AS BIGINT) AS skew4,
               CAST(sum((n_bytes + {_TARGET_FILE_BYTES} - 1)
                        // {_TARGET_FILE_BYTES}) AS BIGINT) AS est_files,
               CAST(count(*) FILTER (WHERE n_bytes < {_TARGET_FILE_BYTES} // 2)
                    AS BIGINT) AS n_small_partitions
        FROM parts GROUP BY spec ORDER BY spec
    """,
    tags=("layout", "planning", "llm-data"),
)
def layout_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec advisor for the documents table: for each
    candidate spec (by source, by lang, by source x lang) the
    partition count, row skew (max-partition rows x partitions /
    total, 1e-4 fixed point — 10000 = perfectly even), the file count
    a {_TARGET_FILE_BYTES // (1024 * 1024)} MiB target would produce
    (bytes proxied by n_chars), and how many partitions land under
    half a target file (the small-file problem the compaction planner
    then has to clean up). Reading this table IS the layout decision:
    a spec with skew4 >> 10000 bottlenecks every downstream shuffle
    on its hot partition; one with n_small_partitions ~ n_partitions
    fragments the scan.

    Scale shape: one scan with a 3x map-side spec explode, a
    (spec, key) count/sum rollup with map-side combine (output
    bounded by the key-domain product, not data), then a 3-row
    rollup. No joins.
    """
    d = widen(load_table(spark, sf_dir, "documents"))
    keyed = d.select(
        "source",
        "lang",
        "n_chars",
        F.explode(
            F.array(
                F.lit("by_source"), F.lit("by_lang"), F.lit("by_source_lang")
            )
        ).alias("spec"),
    ).select(
        "spec",
        F.when(F.col("spec") == "by_source", F.col("source"))
        .when(F.col("spec") == "by_lang", F.col("lang"))
        .otherwise(F.concat_ws("|", "source", "lang"))
        .alias("pkey"),
        "n_chars",
    )
    parts = keyed.groupBy("spec", "pkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("n_chars").cast("long").alias("n_bytes"),
    )
    t = _TARGET_FILE_BYTES
    return (
        parts.groupBy("spec")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_partitions"),
            F.sum("n_rows").cast("long").alias("total_rows"),
            F.max("n_rows").cast("long").alias("max_part_rows"),
            F.expr("(max(n_rows) * count(*) * 10000) div sum(n_rows)")
            .cast("long")
            .alias("skew4"),
            F.sum(F.expr(f"(n_bytes + {t} - 1) div {t}"))
            .cast("long")
            .alias("est_files"),
            F.count_if(F.col("n_bytes") < t // 2)
            .cast("long")
            .alias("n_small_partitions"),
        )
        .orderBy("spec")
    )


# ---------------------------------------------------------------------------
# dedup_minhash_bbit_audit
# ---------------------------------------------------------------------------

_BBITS = (1, 2, 4)


@register(
    "dedup_minhash_bbit_audit",
    oracle=f"""
        WITH words AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
        sh AS (SELECT doc_id, {sql_shingles("w")} AS sh FROM words
               WHERE len(w) >= 3),
        posting AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        {sql_minhash_ctes(MINHASH_PERMS)},
        bands AS (
            SELECT doc_id, p // {MINHASH_PERMS // MINHASH_BANDS} AS band,
                   string_agg(mh, '|' ORDER BY p) AS sig
            FROM minhash GROUP BY 1, 2
        ),
        candidates AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        ),
        bvals AS (SELECT unnest([{", ".join(str(b) for b in _BBITS)}]) AS b),
        matched AS (
            SELECT v.b, c.doc_a, c.doc_b,
                   CAST(count(*) FILTER (
                        WHERE CAST(ma.mh AS BIGINT) % (1 << v.b)
                            = CAST(mb.mh AS BIGINT) % (1 << v.b))
                        AS BIGINT) AS n_match_b
            FROM candidates c
            JOIN minhash ma ON ma.doc_id = c.doc_a
            JOIN minhash mb ON mb.doc_id = c.doc_b AND mb.p = ma.p
            CROSS JOIN bvals v
            GROUP BY 1, 2, 3
        ),
        sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
        exact AS (
            SELECT c.doc_a, c.doc_b,
                   (COUNT(*) * 1000000)
                       // (sa.n + sb.n - COUNT(*)) AS exact_ppm
            FROM candidates c
            JOIN posting pa ON pa.doc_id = c.doc_a
            JOIN posting pb ON pb.doc_id = c.doc_b AND pb.s = pa.s
            JOIN sizes sa ON sa.doc_id = c.doc_a
            JOIN sizes sb ON sb.doc_id = c.doc_b
            GROUP BY c.doc_a, c.doc_b, sa.n, sb.n
        ),
        errs AS (
            SELECT m.b,
                   ((m.n_match_b * (1 << m.b) - {MINHASH_PERMS}) * 1000000)
                       // ({MINHASH_PERMS} * ((1 << m.b) - 1))
                       - x.exact_ppm AS err_ppm
            FROM matched m
            JOIN exact x ON x.doc_a = m.doc_a AND x.doc_b = m.doc_b
        )
        SELECT CAST(b AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(abs(err_ppm)) // count(*) AS BIGINT)
                   AS mean_abs_err_ppm,
               CAST(max(abs(err_ppm)) AS BIGINT) AS max_abs_err_ppm,
               CAST(sum(err_ppm) // count(*) AS BIGINT) AS mean_bias_ppm
        FROM errs GROUP BY b ORDER BY b
    """,
    tags=("llm-data", "dedup", "sketch", "evaluation"),
)
def dedup_minhash_bbit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-bit MinHash accuracy economics (Li & König, "b-Bit Minwise
    Hashing"): keep only the low b bits of each of the
    {MINHASH_PERMS} signature components — a 32x (b=1) to 8x (b=4)
    signature storage reduction — and correct the random-collision
    floor analytically: J_hat = (A_b - 1/2^b) / (1 - 1/2^b) where A_b
    is the matching-component fraction. On every LSH candidate pair
    the audit compares that estimator against exact Jaccard and
    reports mean/max absolute error and signed bias per b: the table
    that decides how small the 100 TB dedup signature store can go.
    Integer arithmetic end-to-end (the estimator is a ratio of
    integers; truncating division matches on both engines including
    for negative estimates).

    Scale shape: signatures build map-side (one md5 per shingle, the
    minhash_array discipline); candidates are LSH-bounded; the b
    ladder multiplies only the per-pair comparison arithmetic
    ({len(_BBITS)}x on a bounded pair set), never the corpus scan;
    the report is a {len(_BBITS)}-row rollup.
    """
    sh = _shingle_sets(spark, sf_dir)
    sigs = sh.select(
        "doc_id",
        F.transform(
            minhash_array(F.col("sh"), MINHASH_PERMS),
            lambda x: x.cast("long"),
        ).alias("mh"),
        F.size("sh").alias("n"),
    ).persist()
    bands = (
        sigs.select(
            "doc_id",
            F.posexplode(
                band_sigs(
                    F.transform(F.col("mh"), lambda x: x.cast("string")),
                    MINHASH_PERMS,
                    MINHASH_BANDS,
                )
            ).alias("band", "sig"),
        )
        .filter(F.col("sig") != "")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ma = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("mh").alias("mh_a"),
        F.col("n").alias("n_a"),
    )
    mb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("mh").alias("mh_b"),
        F.col("n").alias("n_b"),
    )
    paired = candidates.join(ma, "doc_a").join(mb, "doc_b")
    # exact Jaccard via shingle-set intersection (array side — the
    # pair set is LSH-bounded, so the per-pair set op is map-side)
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    exact_ppm = F.expr(
        "(size(array_intersect(sh_a, sh_b)) * 1000000)"
        " div (size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)))"
    )
    withx = (
        paired.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "mh_a",
            "mh_b",
            exact_ppm.alias("exact_ppm"),
        )
    )
    ladder = withx.select(
        "mh_a",
        "mh_b",
        "exact_ppm",
        F.explode(
            F.array(*[F.lit(x).cast("long") for x in _BBITS])
        ).alias("b"),
    )
    n_match_b = F.size(
        F.filter(
            F.zip_with(
                "mh_a",
                "mh_b",
                lambda x, y: (x % F.pow(F.lit(2), F.col("b")).cast("long"))
                == (y % F.pow(F.lit(2), F.col("b")).cast("long")),
            ),
            lambda v: v,
        )
    ).cast("long")
    errs = (
        ladder.withColumn("n_match_b", n_match_b)
        .select(
            "b",
            (
                F.expr(
                    f"((n_match_b * shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"
                    f" - {MINHASH_PERMS}) * 1000000)"
                    f" div ({MINHASH_PERMS}"
                    f" * (shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) - 1))"
                )
                - F.col("exact_ppm")
            ).alias("err_ppm"),
        )
    )
    return (
        errs.groupBy(F.col("b").cast("long").alias("b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.expr("sum(abs(err_ppm)) div count(*)")
            .cast("long")
            .alias("mean_abs_err_ppm"),
            F.max(F.abs("err_ppm")).cast("long").alias("max_abs_err_ppm"),
            F.expr("sum(err_ppm) div count(*)")
            .cast("long")
            .alias("mean_bias_ppm"),
        )
        .orderBy("b")
    )
