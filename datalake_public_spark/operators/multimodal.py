"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Models image/audio/video as ``binary`` columns with a metadata struct, the
way a 100 TB multimodal lake stores them (payload bytes inline or as
object-store pointers; metadata queryable without touching bytes).

The Spark-side plumbing — schemas, Arrow-batched ``mapInPandas``, batch
shapes, partition sizing — is real and tested. The actual codec step is
STUBBED: the decode libraries (PIL/ffmpeg/etc.) are not in this container,
so ``decode_stub`` computes deterministic fake features (byte histogram
moments) with the exact signature/batching a real decoder would use, and
``decode_real`` raises NotImplementedError until a codec is wired in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_public_spark.sources.readers import widen_for_compute

# metadata contract for a binary payload column
MEDIA_META_FIELDS = "media_type string, byte_len int, content_md5 string"


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text", media_type: str = "text/plain"
) -> DataFrame:
    """Wrap a column as an opaque binary payload + metadata struct —
    the ingest shape for any media column. (Here the payload is utf-8
    text since real media isn't available; the schema is the contract.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(F.col(text_col)).alias("byte_len"),
            F.md5(payload).alias("content_md5"),
        ),
    )


FEATURE_SCHEMA = (
    "doc_id long, byte_len int, mean_byte double, max_byte int, n_zero int"
)


def extract_features_stub(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the real distribution pattern for decode-heavy work
    (one Python worker per partition, columnar batches, no per-row
    serialization).

    The per-batch body is where a real image/audio decoder would run;
    the stand-in computes deterministic byte statistics so the plumbing
    (schema, batching, partition shape) is testable in this container."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int32"),
                    "mean_byte": payloads.map(
                        lambda b: (sum(b) / len(b)) if len(b) else 0.0
                    ),
                    "max_byte": payloads.map(lambda b: max(b) if len(b) else 0).astype(
                        "int32"
                    ),
                    "n_zero": payloads.map(lambda b: b.count(0)).astype("int32"),
                }
            )
            yield out

    return widen_for_compute(df.select(id_col, "payload")).mapInPandas(
        batches, FEATURE_SCHEMA
    )


def decode_real(df: DataFrame, codec: str) -> DataFrame:
    """Real media decode — requires codec libraries not present here.

    When wiring in: same mapInPandas shape as extract_features_stub, with
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so one batch of
    decoded frames fits executor memory (images: ~128 rows/batch at 4 MP)."""
    raise NotImplementedError(
        f"codec {codec!r} unavailable in this environment; see extract_features_stub "
        "for the distribution pattern"
    )


def media_metadata(docs_with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Metadata-only projection — must never touch payload bytes (column
    pruning: the scan reads just the meta struct at 100 TB)."""
    return docs_with_payload.select(
        F.col(id_col),
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.content_md5").alias("content_md5"),
    )
