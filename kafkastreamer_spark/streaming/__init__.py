"""Streaming core: reference-semantics stages, sources, sinks, pipeline."""

from kafkastreamer_spark.streaming.stages import (
    STAGE_FUNCTIONS,
    apply_stage,
    apply_stage_chain,
    stage_function,
)

__all__ = [
    "STAGE_FUNCTIONS",
    "stage_function",
    "apply_stage",
    "apply_stage_chain",
]
