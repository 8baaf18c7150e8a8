"""Broadcast-underestimate audit: find joins that the static planner
would BROADCAST at scale because Catalyst's width-ratio size estimate
undershoots the autoBroadcastJoinThreshold once the wide columns are
projected away.

Why this instrument exists: the round-10 x256 probe killed
dedup_minhash_lsh with a 1 GiB driver collect — the band table,
posting list, and per-doc size tables (all corpus-sized) were planned
as broadcast builds because their post-projection size estimates
looked tiny. A plan that broadcasts a relation that GROWS WITH THE
DATA is a 100 TB outage no sf0.1 run can see; this script makes the
class mechanically visible by planning every registered query against
k-times-inflated fact tables and flagging suspicious broadcast
builds.

Method: copy-inflate the fact tables (documents, embeddings, events,
lineitem, orders — plain row duplication; plan SHAPE depends on
estimated sizes, not values) into /tmp/bcast_audit/k{k}, symlink the
dims, build each registered query's physical plan (no execution), and
report every BroadcastExchange whose build subtree
  (a) scans an inflated fact table, AND
  (b) either has NO aggregation (a projection of fact rows is
      corpus-sized), or aggregates ONLY on per-entity id keys
      (doc_id / vec_id / user_id / event_id / order keys — one output
      row per entity is still corpus-sized).
Aggregations to bounded domains (calendar days, event types, band
ids, df-capped stop lists) are not flagged — those broadcasts are the
correct plan.

Usage: python scripts/broadcast_audit.py [sf_dir] [k] [query ...]
Output: one line per flagged (query, exchange) + a summary count.
Exit 1 if anything is flagged (CI-able).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from kafkastreamer_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from kafkastreamer_spark.session import get_spark  # noqa: E402
from kafkastreamer_spark.tables import TABLES, load_table  # noqa: E402

BASE = "/tmp/bcast_audit"
FACT_TABLES = ("documents", "embeddings", "events", "lineitem", "orders")
# per-entity key columns: an aggregate keyed by one of these still has
# one row per entity — corpus-sized, broadcast-unsafe
ENTITY_KEYS = (
    "doc_id",
    "vec_id",
    "user_id",
    "event_id",
    "o_orderkey",
    "l_orderkey",
    "o_custkey",
    "doc_a",
    "doc_b",
    "vec_a",
    "vec_b",
)


def _inflate_all(spark: SparkSession, sf_dir: str, k: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        if t in FACT_TABLES:
            df = load_table(spark, sf_dir, t)
            out = df
            for _ in range(k - 1):
                out = out.unionByName(df)
            out.write.mode("overwrite").parquet(dst)
        else:
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), dst)


def _subtree(lines: list[str], i: int) -> list[str]:
    """Physical-plan subtree of the node at line i (treeString layout:
    children are the following lines whose tree-prefix is longer)."""

    def depth(s: str) -> int:
        m = re.match(r"^[\s:+\-*]*", s)
        return len(m.group(0)) if m else 0

    d0 = depth(lines[i])
    out = [lines[i]]
    for j in range(i + 1, len(lines)):
        if depth(lines[j]) <= d0:
            break
        out.append(lines[j])
    return out


def _flag_subtree(sub: list[str]) -> str | None:
    """Return a reason string if this broadcast build side is
    corpus-scale-suspicious, else None."""
    text = "\n".join(sub)
    facts = [t for t in FACT_TABLES if re.search(rf"\b{t}\b", text)]
    if not facts:
        return None
    if re.search(r"GlobalLimit|TakeOrderedAndProject", text):
        return None  # limit/top-k bounds the build side by construction
    aggs = re.findall(r"HashAggregate\(keys=\[([^\]]*)\]", text) + re.findall(
        r"SortAggregate\(key=\[([^\]]*)\]", text
    ) + re.findall(r"ObjectHashAggregate\(keys=\[([^\]]*)\]", text)
    if not aggs:
        return f"unaggregated scan of {facts}"
    # flag only if EVERY aggregate between the scan and the exchange
    # is keyed by entity ids (bounded-domain aggs justify broadcast)
    for keys in aggs:
        cols = re.findall(r"(\w+)#\d+", keys)
        if not cols:
            return None  # global aggregate: one row, bounded
        if not all(any(c.startswith(e) for e in ENTITY_KEYS) for c in cols):
            return None  # some bounded-domain key: assume justified
    return f"aggregate keyed only by entity ids over {facts}"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    only = set(sys.argv[3:])
    _ensure_loaded()
    spark = get_spark(app_name="kafkastreamer-spark-broadcast-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(BASE, f"k{k}")
    _inflate_all(spark, sf_dir, k, out_dir)

    n_flagged = 0
    n_plans = 0
    for name, spec in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, out_dir)
            plan = df._jdf.queryExecution().sparkPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"PLAN-ERROR {name}: {type(exc).__name__}: {str(exc)[:120]}")
            continue
        n_plans += 1
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "BroadcastExchange" not in line:
                continue
            reason = _flag_subtree(_subtree(lines, i))
            if reason:
                n_flagged += 1
                print(f"FLAG {name}: {reason}")
                print(f"     {lines[i].strip()[:140]}")
    print(f"SUMMARY plans={n_plans} flagged_broadcasts={n_flagged}")
    sys.exit(1 if n_flagged else 0)


if __name__ == "__main__":
    main()
