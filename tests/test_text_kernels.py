"""Kernel ≡ Catalyst equivalence for the rolling-hash family.

The Arrow kernels (functions/text_kernels.py) are the hot path; the
Catalyst expressions (functions/text_funcs.py) are the oracle-checkable
spec. They must agree bit-for-bit on every input shape — including the
edge cases (empty text, single char, no tokens, repeated tokens, >256
chars, non-ASCII codepoints).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_public_spark.functions import text_funcs as T
from datalake_public_spark.functions import text_kernels as K

CASES = [
    "hello world",
    "",
    "x",
    "the the the the",
    "a b c d e f g h i j " * 40,  # > 256 chars, many tokens
    "one-token",
    "  leading and   multiple   spaces ",
    "é ü ñ 中文 token",  # non-ASCII codepoints (utf-32 vs ascii() parity)
    "z" * 300,  # single long token, prefix cut at 256
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)], "doc_id long, text string"
    )


def test_fingerprint_kernel_matches_catalyst(frame):
    prefix = F.substring(F.col("text"), 1, 256)
    both = frame.select(
        "doc_id",
        T.rolling_hash(prefix).alias("spec"),
        K.fingerprint256_kernel("text").alias("kernel"),
    )
    rows = both.collect()
    assert rows, "no rows"
    for r in rows:
        assert r.spec == r.kernel, f"doc {r.doc_id}: {r.spec} != {r.kernel}"


def test_simhash_kernel_matches_catalyst(frame):
    both = frame.select(
        "doc_id",
        T.simhash32("text").alias("spec"),
        K.simhash32_kernel("text").alias("kernel"),
    )
    for r in both.collect():
        assert r.spec == r.kernel, f"doc {r.doc_id}: {r.spec} != {r.kernel}"


def test_kernels_match_on_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prefix = F.substring(F.col("text"), 1, 256)
    diff = docs.select(
        T.rolling_hash(prefix).alias("f_spec"),
        K.fingerprint256_kernel("text").alias("f_k"),
        T.simhash32("text").alias("s_spec"),
        K.simhash32_kernel("text").alias("s_k"),
    ).filter((F.col("f_spec") != F.col("f_k")) | (F.col("s_spec") != F.col("s_k")))
    assert diff.count() == 0
