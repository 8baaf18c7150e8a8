"""Fixture-drift canary (VERDICT r2 item 3).

Round 2 lost 6 correctness entries, 8 tests, and the whole bench to a
silent driver-side fixture regeneration (events.ts TIMESTAMP(NANOS) →
timestamp[us]/NTZ). This test pins the dtypes the engine observes
through ``load_table`` for all ten tables, so the next regeneration
fails ONE obvious test instead of N opaque queries.

Two layers:

* raw parquet footer types via pyarrow (catches the regeneration itself,
  independent of loader normalization), restricted to the columns with a
  history of drifting (timestamps);
* loaded Spark dtypes (the engine-facing contract — what every query
  actually builds plans against). ``events.ts`` must be TIMESTAMP (LTZ)
  regardless of which fixture generation is on disk: the loader
  normalizes both known forms (bigint nanos, NTZ micros).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from kafkastreamer_spark.tables import TABLES, load_table

SF_DIR = "/root/testdata/sf0.001"

# Engine-facing dtypes (post-load_table). If a fixture regeneration
# changes these, either extend the loader normalization (events.ts) or
# audit every query touching the changed column before re-pinning.
EXPECTED_DTYPES: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        # NTZ is fine here: only date-level comparisons/formatting touch
        # it (NTZ-safe). ts-arithmetic must go through _util.epoch_us.
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        # MUST be LTZ whatever is on disk — _load_events normalizes.
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}

# Raw footer types the current loader generation is written against.
# events.ts accepts either known fixture generation.
RAW_TS_ACCEPTED = {
    ("events", "ts"): {"timestamp[ns]", "timestamp[us]"},
    ("orders", "o_orderdate"): {"timestamp[ms]", "timestamp[us]", "timestamp[ns]"},
    ("lineitem", "l_shipdate"): {"timestamp[ms]", "timestamp[us]", "timestamp[ns]"},
}


def test_expected_covers_all_tables():
    assert set(EXPECTED_DTYPES) == set(TABLES)


@pytest.mark.parametrize("name", TABLES)
def test_loaded_dtypes_pinned(spark, name):
    got = load_table(spark, SF_DIR, name).dtypes
    assert got == EXPECTED_DTYPES[name], (
        f"fixture drift in {name!r}: loaded dtypes {got} != pinned "
        f"{EXPECTED_DTYPES[name]} — a driver-side fixture regeneration "
        "likely changed the parquet schema; see tests/test_fixture_schema.py "
        "docstring for the triage procedure"
    )


@pytest.mark.parametrize("sf_dir_name", ["sf0.001", "sf0.01", "sf0.1"])
@pytest.mark.parametrize("key", sorted(RAW_TS_ACCEPTED))
def test_raw_timestamp_physical_types(sf_dir_name, key):
    table, column = key
    path = os.path.join("/root/testdata", sf_dir_name, f"{table}.parquet")
    schema = pq.read_schema(path)
    raw = str(schema.field(column).type)
    # Strip any timezone annotation: "timestamp[us, tz=UTC]" → "timestamp[us]"
    base = raw.split(",")[0].rstrip("]") + "]" if "," in raw else raw
    assert base in RAW_TS_ACCEPTED[key], (
        f"{table}.{column} stored as {raw!r} at {sf_dir_name} — a fixture "
        "generation the loader has never seen; extend _load_events (or the "
        "date-column handling) BEFORE trusting any query results"
    )


PRIMARY_KEYS = {
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "nation": "n_nationkey",
    "region": "r_regionkey",
}


@pytest.mark.parametrize("table", sorted(PRIMARY_KEYS))
def test_primary_keys_unique(spark, sf_dir, table):
    """Tie-break discipline relies on these ids being unique — a
    regenerated fixture with duplicate ids would make every query
    using them as a total-order key silently nondeterministic
    (exactly the hazard the window fuzzer caught for lineitem's
    NON-unique (l_orderkey, l_linenumber), which no query may assume
    unique)."""
    import duckdb

    key = PRIMARY_KEYS[table]
    n, dk = duckdb.sql(
        f"SELECT COUNT(*), COUNT(DISTINCT {key}) FROM "
        f"read_parquet('{sf_dir}/{table}.parquet')"
    ).fetchone()
    assert n == dk, f"{table}.{key}: {n} rows but {dk} distinct ids"


def test_documents_text_is_ascii(sf_dir):
    """The audio-over-bytes operators (multimodal_audio_energy /
    multimodal_audio_vad) equate byte values with code points —
    exactly true only for pure-ASCII text (and their oracles' ascii()
    of each character presumes it). A regenerated fixture with
    multibyte characters must fail HERE, not as an opaque hash
    mismatch: length(text) would diverge from octet_length and
    uint8 bytes from ascii codes."""
    import duckdb

    n_bad, n_len_mismatch = duckdb.sql(
        "SELECT count(*) FILTER (WHERE text != regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')), "
        "count(*) FILTER (WHERE length(text) != octet_length(encode(text))) "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()
    assert n_bad == 0, f"{n_bad} documents contain non-ASCII characters"
    assert n_len_mismatch == 0, (
        f"{n_len_mismatch} documents: char length != byte length"
    )
