"""Source/sink format coverage: ORC round-trip, raw-text corpus
ingest, binary-file corpus ingest (SURVEY.md §2-B sources/sinks).

Reference scope note: the reference's only I/O is Kafka topics with
String payloads (Streamer.java:102-117); the batch format surface is
part of the engine's capability closure, exercised here against real
files.
"""

from __future__ import annotations

import os

import pytest

from kafkastreamer_spark.io import (
    read_binary_corpus,
    read_orc,
    read_text_corpus,
    read_xml,
    write_orc,
    write_xml,
)
from kafkastreamer_spark.tables import load_table


def test_orc_round_trip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_predicate_pushdown(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    plan = (
        read_orc(spark, path)
        .filter("o_orderstatus = 'F'")
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "o_orderstatus" in plan.split("PushedFilters")[1][:200]


def test_xml_round_trip(spark, sf_dir, tmp_path):
    """XML sink/source round-trip (the reference's own interchange
    format — its topology spec is XML, v1/ParserKafka/template.xml)."""
    src = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    path = str(tmp_path / "region_xml")
    write_xml(src, path, row_tag="region")
    back = read_xml(spark, path, row_tag="region").select("r_regionkey", "r_name")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_from_xml_column_parse(spark):
    """XML payload in a column parses with from_xml — the XML sibling
    of events_json_extract's from_json path."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "<r><v>10</v><tag>a</tag></r>"), (2, "<r><v>20</v><tag>b</tag></r>")],
        "id long, payload string",
    )
    parsed = df.select(
        "id", F.from_xml("payload", "v long, tag string").alias("p")
    ).select("id", "p.v", "p.tag")
    assert sorted(map(tuple, parsed.collect())) == [(1, 10, "a"), (2, 20, "b")]


def test_text_corpus_wholetext(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha doc\nwith two lines")
    (d / "b.txt").write_text("beta doc")
    df = read_text_corpus(spark, str(d), wholetext=True)
    rows = {os.path.basename(r.source): r for r in df.collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    assert rows["a.txt"].text == "alpha doc\nwith two lines"
    # deterministic ids: re-read yields identical ids
    again = {
        os.path.basename(r.source): r.doc_id
        for r in read_text_corpus(spark, str(d), wholetext=True).collect()
    }
    assert {k: v.doc_id for k, v in rows.items()} == again


def test_text_corpus_line_mode(spark, tmp_path):
    d = tmp_path / "lines"
    d.mkdir()
    (d / "a.txt").write_text("one\ntwo\ntwo\nthree")
    df = read_text_corpus(spark, str(d), wholetext=False)
    texts = [r.text for r in df.collect()]
    assert sorted(texts) == ["one", "three", "two", "two"]
    # identical lines in one file share an id (exact-dedup-on-entry);
    # distinct lines never collide in this fixture
    ids = df.groupBy("doc_id").count().collect()
    by_count = sorted(r["count"] for r in ids)
    assert by_count == [1, 1, 2]


def test_binary_corpus_modality_and_content(spark, tmp_path):
    d = tmp_path / "assets"
    d.mkdir()
    (d / "x.png").write_bytes(b"\x89PNG-fake")
    (d / "y.wav").write_bytes(b"RIFF-fake")
    (d / "z.bin").write_bytes(b"\x00\x01")
    df = read_binary_corpus(spark, str(d))
    rows = {os.path.basename(r.uri): r for r in df.collect()}
    assert rows["x.png"].modality == "image"
    assert rows["y.wav"].modality == "audio"
    assert rows["z.bin"].modality == "blob"
    assert bytes(rows["x.png"].content) == b"\x89PNG-fake"
    assert rows["y.wav"].n_bytes == len(b"RIFF-fake")
    assert len({r.asset_id for r in rows.values()}) == 3


def test_binary_corpus_glob_prunes_listing(spark, tmp_path):
    d = tmp_path / "assets2"
    d.mkdir()
    (d / "x.png").write_bytes(b"a")
    (d / "y.wav").write_bytes(b"b")
    df = read_binary_corpus(spark, str(d), glob="*.png")
    assert [os.path.basename(r.uri) for r in df.collect()] == ["x.png"]


def test_binary_corpus_feeds_multimodal_stats(spark, tmp_path):
    # the ingest shape plugs straight into the multimodal operators
    pytest.importorskip("pandas")
    d = tmp_path / "assets3"
    d.mkdir()
    (d / "x.png").write_bytes(bytes(range(16)))
    df = read_binary_corpus(spark, str(d))
    from pyspark.sql import functions as F

    out = df.select(
        "asset_id", F.length("content").alias("n"), F.md5(F.hex("content")).alias("h")
    ).collect()
    assert out[0].n == 16


def test_csv_permissive_captures_malformed_rows(spark, tmp_path):
    """Batch CSV ingestion with the quarantine contract the streaming
    stages already have (SURVEY §7 hard-part d): PERMISSIVE mode
    parses what it can and lands the raw text of malformed rows in a
    corrupt-record column instead of crashing — the reference's
    Integer.parseInt crash behavior, corrected, on the batch path."""
    from pyspark.sql import functions as F

    p = tmp_path / "raw.csv"
    p.write_text("1,alpha,10\n2,beta,not_a_number\n3,gamma,30\nbroken row\n")
    schema = "id INT, name STRING, qty INT, _bad STRING"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(str(p))
    )
    df = df.cache()  # corrupt-record column requires a raw-row pass
    good = df.filter(F.col("_bad").isNull())
    bad = df.filter(F.col("_bad").isNotNull())
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    bad_rows = sorted(r["_bad"] for r in bad.collect())
    assert bad_rows == ["2,beta,not_a_number", "broken row"]
    df.unpersist()


def test_json_permissive_captures_malformed_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    """JSON ingestion quarantine — the JSON twin of the CSV
    PERMISSIVE test above: malformed lines land in _corrupt_record
    with every well-formed field parsed, instead of failing the job
    (the engine-wide no-crash parse policy, SURVEY §7 hard-part d)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"k": 1, "v": "ok"}\n'
        '{"k": 2, "v": "also ok"}\n'
        '{"k": "not-a-number", "v": "bad type"}\n'
        "this is not json at all\n"
    )
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("v", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
        .cache()
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r["k"] for r in good.collect()) == [1, 2]
    assert bad.count() == 2  # type mismatch + unparseable line
    raw = [r["_corrupt_record"] for r in bad.collect()]
    assert any("not-a-number" in x for x in raw)
    assert any("not json" in x for x in raw)
