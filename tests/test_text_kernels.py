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
    ).filter(~F.col("f_spec").eqNullSafe(F.col("f_k"))
             | ~F.col("s_spec").eqNullSafe(F.col("s_k")))
    assert diff.count() == 0


def test_kernels_propagate_null_text(spark):
    """NULL text must stay NULL — the Catalyst spec and the DuckDB
    oracles both propagate it; a fillna('') kernel would emit 917/0."""
    df = spark.createDataFrame(
        [(1, "hello"), (2, None), (3, "")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: (r.f_spec, r.f_k, r.s_spec, r.s_k)
        for r in df.select(
            "doc_id",
            T.rolling_hash(F.substring(F.col("text"), 1, 256)).alias("f_spec"),
            K.fingerprint256_kernel("text").alias("f_k"),
            T.simhash32("text").alias("s_spec"),
            K.simhash32_kernel("text").alias("s_k"),
        ).collect()
    }
    assert rows[2] == (None, None, None, None)
    assert rows[1][0] == rows[1][1] and rows[1][2] == rows[1][3]
    assert rows[3][0] == rows[3][1]  # empty string: spec's split('','') case


def test_kernel_survives_megatoken(spark):
    """One whitespace-free 200k-char document must hash correctly AND not
    blow up memory: the kernel buckets strings by length before padding,
    so a single long token can't inflate every row's padding."""
    docs = [(i, f"doc {i} word word") for i in range(500)] + [(999, "z" * 200_000)]
    df = spark.createDataFrame(docs, "doc_id long, text string").coalesce(1)
    both = df.select(
        "doc_id",
        T.simhash32("text").alias("spec"),
        K.simhash32_kernel("text").alias("kernel"),
    )
    diff = both.filter(~(F.col("spec").eqNullSafe(F.col("kernel")))).count()
    assert diff == 0
