"""CI guard for scripts/kafka_topology_smoke.py (round-3 verdict #3):
the dry-run transport exercises the exact drain/verify logic the
broker run will use, so deployment day only changes the channel
objects."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from kafka_topology_smoke import (  # noqa: E402
    probe_blockers,
    run_eos_smoke,
    run_topology_smoke,
)
from kafkastreamer_spark.plans.topology_mode import DirChannels
from kafkastreamer_spark.streaming.eos import DirEosChannel


def test_probe_blockers_reports_current_environment():
    b = probe_blockers("localhost:9092")
    # in this sandbox all three blockers hold; on a real deployment
    # any of these flipping is the signal to run the kafka mode
    assert set(b) == {"broker_reachable", "spark_sql_kafka_jar", "python_kafka_client"}


def test_dry_run_topology_end_values(spark, tmp_path):
    channels = DirChannels(str(tmp_path / "ch"), "smoke")
    res = run_topology_smoke(spark, channels, str(tmp_path / "ckpt"), 300)
    assert res["ok"], res
    assert (res["lo"], res["hi"]) == (3, 302)


def test_dry_run_eos_replay_dedups(spark, tmp_path):
    ch = DirEosChannel(str(tmp_path / "eos"))
    res = run_eos_smoke(
        spark, ch, str(tmp_path / "src"), str(tmp_path / "ckpt"), 200
    )
    assert res["ok"], res
    assert res["raw_rows"] == 400 and res["deduped_rows"] == 200
