"""Pipeline/topology compiler (SURVEY.md §2-A A14/A15)."""

from kafkastreamer_spark.plans.pipeline import (
    PipelineSpec,
    StageSpec,
    compile_pipeline,
    parse_topology_xml,
    validate_spec,
)

__all__ = [
    "PipelineSpec",
    "StageSpec",
    "validate_spec",
    "parse_topology_xml",
    "compile_pipeline",
]
