"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query implementations live in the engine package:
  datalake_public_spark/driver_queries.py      — SURVEY §2 operator parity
  datalake_public_spark/driver_queries_llm.py  — dedup / similarity / text /
                                                 multimodal pipeline operators
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datalake_public_spark.driver_queries import REGISTRY  # noqa: E402
from datalake_public_spark.driver_queries_adv import ADV_REGISTRY  # noqa: E402
from datalake_public_spark.driver_queries_ext import EXT_REGISTRY  # noqa: E402
from datalake_public_spark.driver_queries_llm import LLM_REGISTRY  # noqa: E402
from datalake_public_spark.driver_queries_streaming import STREAMING_REGISTRY  # noqa: E402

_ALL = {**REGISTRY, **LLM_REGISTRY, **EXT_REGISTRY, **STREAMING_REGISTRY, **ADV_REGISTRY}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full star-join
    regional-revenue aggregation (broadcast dims, partial aggregation)."""
    from datalake_public_spark.driver_queries import q5_regional_revenue

    return q5_regional_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + the
    training-data-pipeline operators (BASELINE.json north star)."""
    return {name: spec.spark for name, spec in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query. Omitted
    (rows-only check) for: dedup_minhash_lsh, similarity_ann_lsh,
    similarity_ivf (approximate by design; recall vs exact baselines
    asserted in tests), ml_kmeans_embeddings (iterative MLlib fit),
    approx_distinct / approx_quantiles (sketch values are
    implementation-specific; accuracy bounds asserted in tests)."""
    return {name: spec.oracle for name, spec in _ALL.items() if spec.oracle is not None}
