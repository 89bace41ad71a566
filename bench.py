"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through a noop sink (full materialization — count()
would let Catalyst prune the very columns being benchmarked). Session uses
the same engine profile as production (session.py): AQE on, UTC, Arrow on.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datalake_public_spark import EngineConfig, get_spark
from datalake_public_spark.driver_queries import REGISTRY
from datalake_public_spark.driver_queries_llm import LLM_REGISTRY

# The headline set: every engine surface (scan-agg, star join, window,
# sessionize, dedup exact/LSH, text analysis, fingerprint, ANN, streaming-
# shaped window agg) — the queries a 100 TB deployment runs daily.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_regional_revenue",
    "q6_revenue_forecast",
    "window_topk",
    "sessionize",
    "tumbling_window_agg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "doc_fingerprint",
    "similarity_ann_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = get_spark(
        EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = {**REGISTRY, **LLM_REGISTRY}

    # untimed warmup: JVM/codegen spin-up + scan of the two hot tables
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    # spin up the reusable Python workers (numpy/pandas import once per
    # executor thread) so Arrow-kernel queries measure compute, not fork
    @F.pandas_udf("long")
    def _warm(x: pd.Series) -> pd.Series:
        return x

    spark.range(0, int(cpus) * 4, 1, int(cpus)).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name].spark
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
