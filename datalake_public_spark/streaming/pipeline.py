"""Streaming GBFS pipeline: the batch flatten operators over readStream.

SURVEY §7.2 step 7: replace the cron-per-snapshot semantics
(``dags/dag_bike.py:36`` + path surgery ``transform_ss_velib_with_spark.py:36-38``)
with a file streaming source over the raw zone. ``flatten_feed`` is a
stateless DataFrame→DataFrame operator, so the exact batch code runs
under the micro-batch engine unchanged — one code path, two execution
modes. Each run with ``availableNow`` processes only snapshots that
arrived since the last checkpoint: incremental, exactly-once, no
manual "which folder is new" bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datalake_public_spark.operators.flatten import FeedSpec, flatten_feed
from datalake_public_spark.streaming.runner import write_available_now
from datalake_public_spark.streaming.sources import read_json_stream


def stream_flatten_feed(
    spark: SparkSession,
    raw_path: str,
    spec: FeedSpec,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming flatten: raw-zone JSON snapshots → flat formatted rows."""
    raw = read_json_stream(
        spark, raw_path, spec.raw_schema, max_files_per_trigger=max_files_per_trigger
    )
    return flatten_feed(raw, spec)


def run_streaming_format_stage(
    spark: SparkSession,
    raw_path: str,
    out_path: str,
    spec: FeedSpec,
    *,
    checkpoint_dir: str | None = None,
) -> None:
    """One formatted-zone build: drain pending raw snapshots → parquet.

    The streaming replacement for the reference's per-snapshot
    ``spark-submit`` transform tasks (``dags/dag_bike.py:69-112``)."""
    flat = stream_flatten_feed(spark, raw_path, spec)
    write_available_now(flat, out_path, checkpoint_dir=checkpoint_dir)
