"""Query library — importing this package populates the registry."""

from kafkastreamer_spark.queries import (  # noqa: F401
    events,
    events2,
    governance,
    graph,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    relational8,
    relational9,
    relational10,
    relational11,
    relational12,
    relational13,
    relational14,
    relational15,
    relational16,
    relational17,
    relational18,
    relational19,
    relational20,
    relational21,
    relational22,
    relational23,
    relational24,
)
from kafkastreamer_spark import operators  # noqa: F401
from kafkastreamer_spark.plans import corpus_pipeline  # noqa: F401  (registers pipeline_corpus_topology)
