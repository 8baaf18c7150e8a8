"""Reference stage functions as Catalyst Column expressions.

The reference dispatches a per-record integer function by name —
``adder``/``power``/``diff``/``identity`` with constant arg 1, unknown
names falling back to identity (reference ``parse_function``,
v1/src/main/java/Stream/Streamer.java:166-205). Here each is a pure
Column-expression builder, so a whole stage chain compiles into one
whole-stage-codegen projection: no per-record loop, no Python in the
hot path, and a k-stage chain costs the same single pass as one stage.

Payload handling: the reference crashes on non-integer values
(``Integer.parseInt``, Streamer.java:328). The engine instead parses
with null-on-failure (``try_cast``) and keeps the raw value in a
quarantine column — SURVEY.md §7 hard-part (d).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (value_col, arg) -> Column. Mirrors the reference's allowed
# set {adder, power, diff, identity} (Streamer.java:186-205;
# whitelist also enforced at topology-parse time, KafkaParser.py:124).
STAGE_FUNCTIONS: dict[str, Callable[[Column, int], Column]] = {
    "adder": lambda v, s: v + s,
    # Reference power is int-truncated Math.pow (Streamer.java:170-172).
    "power": lambda v, s: F.pow(v, F.lit(s)).cast("long"),
    "diff": lambda v, s: v - s,
    "identity": lambda v, s: v,
}

DEFAULT_STAGE_ARG = 1  # the reference hard-codes s=1 (Streamer.java:328)


def stage_function(name: str) -> Callable[[Column, int], Column]:
    """Name → expression builder; unknown names fall back to identity,
    matching the reference's dispatch (Streamer.java:200-203)."""
    return STAGE_FUNCTIONS.get(name, STAGE_FUNCTIONS["identity"])


def parse_value(raw: Column) -> Column:
    """String payload → long, null on malformed input (engine policy:
    never crash the job on one bad record)."""
    return raw.try_cast("long")


def apply_stage(
    df: DataFrame,
    op: str,
    value_col: str = "value",
    arg: int = DEFAULT_STAGE_ARG,
) -> DataFrame:
    """One reference stage: value' = f(value, arg); key untouched
    (key-preserving projection, Streamer.java:330-336)."""
    fn = stage_function(op)
    return df.withColumn(value_col, fn(F.col(value_col), arg))


def apply_stage_chain(
    df: DataFrame,
    ops: Sequence[str],
    value_col: str = "value",
    arg: int = DEFAULT_STAGE_ARG,
) -> DataFrame:
    """Compose a linear stage chain (reference topology, SURVEY.md
    §1.3) into a single projection. Catalyst constant-folds e.g.
    three adders into ``value + 3``."""
    out = df
    for op in ops:
        out = apply_stage(out, op, value_col=value_col, arg=arg)
    return out
