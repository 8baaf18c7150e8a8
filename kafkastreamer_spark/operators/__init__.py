"""Training-data-pipeline operators (SURVEY.md §2-B north star):
dedup, similarity search, text analysis, multimodal plumbing.

Importing this package registers the operator queries."""

from kafkastreamer_spark.operators import (  # noqa: F401
    corpus,
    dedup,
    dedup_para,
    dedup_span,
    quality,
    sampling,
    sketches,
    skew,
    multimodal,
    selection,
    similarity,
    text,
    training,
)
