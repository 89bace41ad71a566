"""datalake_public_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-expression of the capabilities of the
reference data-lake pipeline (``IndiraFa/datalake_public``): semi-structured
JSON ingestion with nested-array flattening, a relational enrichment layer
(join / normalize / union), data-quality gates, serving-shape projections,
and a weighted geo-clustering analytic — plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB lake needs.

Design principles (see SURVEY.md §4/§7):
  * declarative DataFrame/SQL plans end-to-end — one unbroken Catalyst plan
    per pipeline stage, never ``createDataFrame(df.rdd, schema)``;
  * explicit StructType schemas at every boundary — no production-path
    schema inference;
  * Hive-partitioned lake zones so partition pruning replaces manual path
    surgery;
  * broadcast the small side, aggregate partially, stay JVM-side;
  * Python only via Arrow-batched pandas UDFs, never row-at-a-time.
"""

__version__ = "0.1.0"

from datalake_public_spark.config import EngineConfig
from datalake_public_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark", "__version__"]
