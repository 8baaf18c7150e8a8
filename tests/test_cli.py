"""CLI surface (python -m kafkastreamer_spark): the dag mode runs a
fan-out/fan-in topology JSON end-to-end and writes one directory per
sink; invalid topologies exit with code 2."""

from __future__ import annotations

import json
import os

from kafkastreamer_spark.__main__ import main


def test_dag_mode_end_to_end(spark, tmp_path):
    topo = tmp_path / "topo.json"
    topo.write_text(json.dumps({
        "stream_id": "t",
        "sinks": ["merged"],
        "nodes": [
            {"name": "src", "operation": "source"},
            {"name": "clean", "operation": "adder", "inputs": ["src"]},
            {"name": "left", "operation": "adder", "inputs": ["clean"]},
            {"name": "right", "operation": "diff", "inputs": ["clean"]},
            {"name": "merged", "operation": "union",
             "inputs": ["left", "right"]},
        ],
    }))
    out = str(tmp_path / "out")
    rc = main([
        "--topology", str(topo), "--mode", "dag",
        "--records", "20", "--out", out, "--show", "1",
    ])
    assert rc == 0
    vals = sorted(
        int(r["value"])
        for r in spark.read.parquet(os.path.join(out, "merged")).collect()
    )
    assert vals == sorted(list(range(0, 20)) + list(range(2, 22)))


def test_invalid_dag_exits_2(tmp_path):
    topo = tmp_path / "bad.json"
    topo.write_text(json.dumps({
        "nodes": [
            {"name": "a", "operation": "adder", "inputs": ["a"]},
        ],
    }))
    assert main(["--topology", str(topo), "--mode", "dag"]) == 2

def test_malformed_json_exits_2(tmp_path):
    """Malformed JSON (or an XML file passed with --mode dag) must hit
    the clean exit-2 path, not an uncaught JSONDecodeError."""
    topo = tmp_path / "broken.json"
    topo.write_text("{not json")
    assert main(["--topology", str(topo), "--mode", "dag"]) == 2

    xml = tmp_path / "topo.xml"
    xml.write_text("<topology><streamID>x</streamID></topology>")
    assert main(["--topology", str(xml), "--mode", "dag"]) == 2

    assert main(["--topology", str(tmp_path / "absent.json"), "--mode", "dag"]) == 2
