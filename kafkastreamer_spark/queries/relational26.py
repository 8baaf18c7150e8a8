"""Round-9 batch 235: Count-Min width economics, Borůvka MST round.

* ``agg_countmin_width_audit`` — the sketch-DESIGN table for the
  engine's exact-replayable Count-Min construction
  (operators/sketches.py): per candidate width w in {{64, 256,
  1024}}, the measured overcount distribution against exact counts
  next to the analytic N/w bound — the "how wide must the sketch be"
  decision, the same measure-the-estimator discipline as
  dedup_minhash_estimate_audit and dedup_minhash_bbit_audit.
* ``graph_boruvka_round`` — one round of Borůvka's MST algorithm
  over the weighted part–supplier graph: every node picks its
  minimum-weight incident edge, the chosen set forms a forest, and
  the report prices the round (components eliminated, weight
  admitted). The distributed-MST superstep, joining the engine's
  Pregel family (connected components, label propagation, BFS,
  PageRank) with a WEIGHTED selection semantics none of them have.

Reference parity note: the reference engine computes nothing of this
kind (keyed integer streamer, v1/src/main/java/Stream/Streamer.java);
these belong to the SURVEY §2 Part-B sketch/graph closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.operators.sketches import CMS_DEPTH
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table, widen

# ---------------------------------------------------------------------------
# agg_countmin_width_audit
# ---------------------------------------------------------------------------

_CMS_WIDTHS = (64, 256, 1024)


@register(
    "agg_countmin_width_audit",
    oracle=f"""
        WITH exact AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
            FROM events GROUP BY user_id
        ),
        tot AS (SELECT CAST(sum(exact_cnt) AS BIGINT) AS n FROM exact),
        ws AS (SELECT unnest([{", ".join(str(w) for w in _CMS_WIDTHS)}]) AS w),
        salted AS (
            SELECT ws.w, e.user_id, e.exact_cnt, u.d,
                   CAST(('0x' || substr(md5(CAST(u.d AS VARCHAR) || ':' ||
                        CAST(e.user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       % ws.w AS bucket
            FROM exact e
            CROSS JOIN ws
            CROSS JOIN unnest(range(0, {CMS_DEPTH})) AS u(d)
        ),
        cells AS (
            SELECT w, d, bucket, CAST(sum(exact_cnt) AS BIGINT) AS cell
            FROM salted GROUP BY w, d, bucket
        ),
        est AS (
            SELECT s.w, s.user_id,
                   max(s.exact_cnt) AS exact_cnt,
                   min(c.cell) AS cms_estimate
            FROM salted s
            JOIN cells c ON c.w = s.w AND c.d = s.d AND c.bucket = s.bucket
            GROUP BY s.w, s.user_id
        )
        SELECT CAST(w AS BIGINT) AS width,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(count(*) FILTER (WHERE cms_estimate = exact_cnt)
                    AS BIGINT) AS n_exact,
               CAST(sum(cms_estimate - exact_cnt) // count(*) AS BIGINT)
                   AS mean_overcount,
               CAST(max(cms_estimate - exact_cnt) AS BIGINT)
                   AS max_overcount,
               CAST((SELECT n FROM tot) // w AS BIGINT) AS bound_n_over_w
        FROM est GROUP BY w ORDER BY width
    """,
    tags=("sketch", "aggregate", "evaluation"),
)
def agg_countmin_width_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min width-sizing table: the engine's md5-exact CMS
    construction evaluated at widths {_CMS_WIDTHS} (depth
    {CMS_DEPTH}), reporting per width how many keys read back exact,
    the mean and max overcount, and the analytic per-row expected
    bound N/w beside the measurements. Reading across the row ladder
    answers "what does doubling the sketch buy" with data instead of
    the bound alone — the same estimator-audit discipline the MinHash
    family gets from dedup_minhash_estimate_audit /
    dedup_minhash_bbit_audit.

    Scale shape: ONE full-data exchange (the exact per-key
    pre-aggregation); the width ladder explodes only the aggregated
    key table ({len(_CMS_WIDTHS)} x {CMS_DEPTH} rows per DISTINCT
    key); cells are (w, d, bucket)-bounded and broadcast back for
    the readout join; the report is a {len(_CMS_WIDTHS)}-row rollup.
    """
    ev = widen(load_table(spark, sf_dir, "events"))
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    total = exact.agg(F.sum("exact_cnt").cast("long").alias("n"))
    salted = (
        exact.select(
            "user_id",
            "exact_cnt",
            F.explode(
                F.array(*[F.lit(w).cast("long") for w in _CMS_WIDTHS])
            ).alias("w"),
        )
        .select(
            "user_id",
            "exact_cnt",
            "w",
            F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"),
        )
        .withColumn(
            "bucket",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("d").cast("string"),
                            F.lit(":"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.col("w"),
        )
    )
    cells = salted.groupBy("w", "d", "bucket").agg(
        F.sum("exact_cnt").cast("long").alias("cell")
    )
    est = (
        salted.join(F.broadcast(cells), ["w", "d", "bucket"])
        .groupBy("w", "user_id")
        .agg(
            F.max("exact_cnt").alias("exact_cnt"),
            F.min("cell").alias("cms_estimate"),
        )
    )
    return (
        est.groupBy(F.col("w").cast("long").alias("width"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.count_if(F.col("cms_estimate") == F.col("exact_cnt"))
            .cast("long")
            .alias("n_exact"),
            F.expr("sum(cms_estimate - exact_cnt) div count(*)")
            .cast("long")
            .alias("mean_overcount"),
            F.max(F.col("cms_estimate") - F.col("exact_cnt"))
            .cast("long")
            .alias("max_overcount"),
        )
        .crossJoin(F.broadcast(total))
        .withColumn("bound_n_over_w", F.expr("n div width").cast("long"))
        .drop("n")
        .orderBy("width")
    )


# ---------------------------------------------------------------------------
# graph_boruvka_round
# ---------------------------------------------------------------------------


@register(
    "graph_boruvka_round",
    oracle="""
        WITH wedges AS (
            SELECT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v,
                   CAST(min(FLOOR(l_extendedprice * 100)) AS BIGINT)
                       AS w_cents
            FROM lineitem GROUP BY 1, 2
        ),
        incident AS (
            SELECT u AS node, v AS other, w_cents FROM wedges
            UNION ALL
            SELECT v AS node, u AS other, w_cents FROM wedges
        ),
        choice AS (
            SELECT node,
                   first(other ORDER BY w_cents, other) AS best_other,
                   first(w_cents ORDER BY w_cents, other) AS best_w
            FROM incident GROUP BY node
        ),
        chosen AS (
            SELECT DISTINCT LEAST(node, best_other) AS lo,
                   GREATEST(node, best_other) AS hi,
                   best_w AS w_cents
            FROM choice
        ),
        mutual AS (
            SELECT count(*) AS n FROM choice a
            JOIN choice b ON b.node = a.best_other
            WHERE b.best_other = a.node AND a.node < b.node
        )
        SELECT CAST((SELECT count(*) FROM choice) AS BIGINT) AS n_nodes,
               CAST(count(*) AS BIGINT) AS n_chosen_edges,
               CAST((SELECT count(*) FROM choice) - count(*) AS BIGINT)
                   AS n_components_after,
               CAST(sum(w_cents) AS BIGINT) AS forest_weight_cents,
               CAST((SELECT n FROM mutual) AS BIGINT) AS n_mutual_pairs
        FROM chosen
    """,
    tags=("graph", "iterative", "mst"),
)
def graph_boruvka_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Borůvka MST superstep over the weighted part–supplier
    bipartite graph (edge weight = cheapest lineitem price in exact
    cents for that (part, supplier) pair): every node selects its
    minimum-weight incident edge (ties on the neighbor id), the
    distinct chosen edges form a forest, and the report prices the
    round — components remaining after merging (n_nodes - |forest|,
    since each singleton-tree merge eliminates exactly one
    component), admitted weight, and how many edges were chosen from
    BOTH endpoints (the mutual pairs that make the chosen set a
    forest rather than a pseudoforest). Production MST iterates this
    superstep O(log n) times with CC-style component relabeling
    between rounds — the round is the unit being certified, exactly
    like graph_connected_components' fixed-k propagation.

    Scale shape: edge weights partial-aggregate map-side from
    lineitem; the per-node argmin is ONE groupBy over the doubled
    edge list (first() over a (w, other) sort within the key — no
    window over raw data); chosen-edge dedup and the rollup are
    bounded by nodes, not edges. No joins on the big side; the
    mutual-pair check self-joins the node-sized choice table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wedges = li.groupBy(
        (F.col("l_partkey") * 2).alias("u"),
        (F.col("l_suppkey") * 2 + 1).alias("v"),
    ).agg(
        F.min(F.floor(F.col("l_extendedprice") * 100))
        .cast("long")
        .alias("w_cents")
    )
    incident = wedges.select(
        F.col("u").alias("node"), F.col("v").alias("other"), "w_cents"
    ).unionByName(
        wedges.select(
            F.col("v").alias("node"), F.col("u").alias("other"), "w_cents"
        )
    )
    # per-node argmin via min(struct) — map-side combinable, no window
    choice = (
        incident.groupBy("node")
        .agg(F.min(F.struct("w_cents", "other")).alias("m"))
        .select(
            "node",
            F.col("m.other").alias("best_other"),
            F.col("m.w_cents").alias("best_w"),
        )
        .persist()  # chosen + mutual both read it
    )
    chosen = choice.select(
        F.least("node", "best_other").alias("lo"),
        F.greatest("node", "best_other").alias("hi"),
        F.col("best_w").alias("w_cents"),
    ).distinct()
    a = choice.alias("a")
    b = choice.alias("b")
    mutual = (
        a.join(
            b,
            (F.col("b.node") == F.col("a.best_other"))
            & (F.col("b.best_other") == F.col("a.node"))
            & (F.col("a.node") < F.col("b.node")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_mutual_pairs"))
    )
    n_nodes = choice.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    stats = chosen.agg(
        F.count(F.lit(1)).cast("long").alias("n_chosen_edges"),
        F.sum("w_cents").cast("long").alias("forest_weight_cents"),
    )
    return (
        n_nodes.crossJoin(stats)
        .crossJoin(mutual)
        .select(
            "n_nodes",
            "n_chosen_edges",
            (F.col("n_nodes") - F.col("n_chosen_edges"))
            .cast("long")
            .alias("n_components_after"),
            "forest_weight_cents",
            "n_mutual_pairs",
        )
    )
