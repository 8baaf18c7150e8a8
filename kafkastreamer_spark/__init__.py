"""kafkastreamer_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference stream processor
``edoardoramalli/KafkaStreamer`` (surveyed in SURVEY.md), widened to
the full relational surface plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing).

Design principles (SURVEY.md §1.4, §4):

* DataFrame/SQL only — the logical plan is declared with the DataFrame
  API and Catalyst/Tungsten pick the physical strategy.
* No custom execution code where a built-in exists; Pandas UDFs /
  ``applyInPandas`` only where built-ins can't express the semantics.
* Every batch operator is registered in :mod:`kafkastreamer_spark.registry`
  with a DuckDB-runnable oracle SQL so correctness is machine-checked.
"""

from kafkastreamer_spark.session import get_spark
from kafkastreamer_spark.tables import TABLES, load_table, register_views

__all__ = ["get_spark", "load_table", "register_views", "TABLES"]

__version__ = "0.1.0"
