"""docs/PLAN_AUDIT.md freshness (round-4 verdict item #3): the audit
table is the reviewable evidence for the registry's plan quality, and
it silently went stale at 390/396 rows in round 4. This pins it: the
doc must contain exactly one row per registered query, so any batch
that grows the registry regenerates the audit
(`python scripts/plan_audit.py`) or fails CI."""

from __future__ import annotations

import os
import re

from kafkastreamer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

_DOC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "PLAN_AUDIT.md",
)


def _audit_rows() -> dict[str, str]:
    rows = {}
    with open(_DOC) as f:
        for line in f:
            m = re.match(r"\| (\w+) \| ", line)
            if m and m.group(1) != "query":
                rows[m.group(1)] = line
    return rows


def test_audit_covers_exactly_the_registry():
    rows = _audit_rows()
    missing = sorted(set(REGISTRY) - set(rows))
    extra = sorted(set(rows) - set(REGISTRY))
    assert not missing, f"PLAN_AUDIT.md stale — regenerate: missing {missing[:5]}"
    assert not extra, f"PLAN_AUDIT.md has unregistered rows: {extra[:5]}"


def test_audit_has_no_banned_classes():
    """The generated table must show zero base-table single-partition
    exchanges and zero row-at-a-time Python nodes."""
    for name, line in _audit_rows().items():
        assert "BASE" not in line, f"{name}: base_table 1-part exchange in audit"
        assert "ERROR" not in line, f"{name}: audit row errored — regenerate"


def test_audit_codegen_column_alive():
    """VERDICT r6 cosmetic #3: the codegen column silently read 0 for
    every row because Spark 4.1 renders whole-stage-codegen as `*(n)`
    span markers (simple mode) / `[codegen id : n]` (formatted), not
    the literal "WholeStageCodegen". Canary: q1 is a plain
    scan->agg->sort pipeline that ALWAYS codegens, so its audit row
    must show a nonzero span count — if the renderer changes again,
    this fails instead of the metric dying silently."""
    row = _audit_rows()["q1_pricing_summary"]
    codegen = int(row.rstrip().rstrip("|").split("|")[-1].strip())
    assert codegen > 0, f"codegen column dead again: {row!r}"
