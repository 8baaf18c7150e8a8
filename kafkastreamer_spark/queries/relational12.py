"""Round-4 batch: scale-safe plan variants for the operators the
round-3 verdict flagged as plan-quality weak spots.

The reference has no relational surface (its operators are the keyed
arithmetic stages, Streamer.java:443-466); these entries close the
engine's OWN scale gaps:

* ``agg_equidepth_histogram_sampled`` — the companion to
  ``agg_equidepth_histogram`` (queries/events.py) without its
  ``Exchange SinglePartition`` + single-task global sort.  Despite the
  name (kept from the round-3 verdict item), the variant is EXACT, not
  sampled: each row's global rank is computed with the two-phase
  bucketed cumsum of ``operators/deskew.bucketed_row_number`` (range
  buckets on the sort-key prefix are order-preserving, so the rank is
  bit-identical to the single-window formulation), and the ntile bin
  falls out of the rank in closed form.  Same oracle as the exact
  variant — stronger than the tolerance-style oracle the verdict asked
  for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamer_spark.operators.deskew import bucketed_row_number
from kafkastreamer_spark.registry import register
from kafkastreamer_spark.tables import load_table

# Range-bucket width for the o_totalprice global rank. o_totalprice
# spans ~[850, 560k] in the TPC-H-ish fixture, so 4096-wide buckets
# give ~140 sort partitions at any SF; at 100 TB you'd shrink the
# width (the counts table stays tiny — it is |buckets| rows).
_PRICE_BUCKET_W = 4096


@register(
    "agg_equidepth_histogram_sampled",
    oracle="""
        WITH binned AS (
            SELECT o_totalprice,
                   ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
            FROM orders
        )
        SELECT bin, count(*) AS n,
               min(o_totalprice) AS lo, max(o_totalprice) AS hi
        FROM binned GROUP BY bin ORDER BY bin
    """,
    tags=("aggregate", "histogram", "statistics", "deskew"),
)
def agg_equidepth_histogram_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram WITHOUT the global single-task sort: the
    scale-safe twin of ``agg_equidepth_histogram`` (the round-3
    verdict's #1 item — the last ``Exchange SinglePartition`` plan in
    the registry).

    ``ntile(10) OVER (ORDER BY price, key)`` is just a closed-form
    function of the row's global rank r in that total order::

        base = N div 10;  rem = N mod 10;  cutoff = rem * (base+1)
        bin  = (r-1) div (base+1) + 1                       if r <= cutoff
             = rem + (r - cutoff - 1) div base + 1          otherwise

    so the only hard part is the exact global rank — which
    ``bucketed_row_number`` computes skew-free: range-bucket the rows
    by ``floor(price / W)`` (monotone in the sort-key prefix, so
    (bucket, price, key) orders identically to (price, key)), count
    rows per bucket with an ordinary map-side-combining aggregate,
    prefix-sum the tiny |buckets|-row counts table into rank offsets,
    and add a per-bucket local ``row_number``.  The heaviest sort task
    holds one price range, not the table; the result is bit-identical
    to the ntile formulation (same oracle as the exact variant — no
    tolerance needed).

    Plan-asserted in tests/test_equidepth_scalable.py: the de-skew
    bucket column is present and no ntile / whole-table window
    remains."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked = bucketed_row_number(
        o,
        [],
        F.floor(F.col("o_totalprice") / _PRICE_BUCKET_W).cast("long"),
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        "r",
        count_name="N",
    )
    binned = ranked.select(
        "o_totalprice",
        F.expr(
            """
            CASE WHEN r <= (N % 10) * (N div 10 + 1)
                 THEN (r - 1) div (N div 10 + 1) + 1
                 ELSE (N % 10) + (r - (N % 10) * (N div 10 + 1) - 1)
                                  div (N div 10) + 1
            END
            """
        ).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .select(F.col("bin").cast("long").alias("bin"), "n", "lo", "hi")
        .orderBy("bin")
    )
