"""Pipeline/topology compiler (SURVEY.md §2-A A14/A15), plus the DAG
generalization (fan-out/fan-in) the linear reference cannot express."""

from kafkastreamer_spark.plans.dag import (
    DagNode,
    DagSpec,
    compile_dag,
    from_pipeline_spec,
    validate_dag,
)
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
    "DagNode",
    "DagSpec",
    "validate_dag",
    "compile_dag",
    "from_pipeline_spec",
]
