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


# -- normalization kernel --------------------------------------------------


def test_normalize_text_matches_duckdb_on_crafted_unicode(spark):
    import duckdb
    import pandas as pd

    from datalake_public_spark.functions.text_kernels import normalize_text_sql
    from datalake_public_spark.operators.text import normalize_text

    rows = [
        (1, "café crema"),          # decomposed é → composed
        (2, "a\r\nb\rc"),                       # CRLF + stray CR
        (3, "x\x00y\x07z\x7f!"),               # control chars stripped
        (4, "too   many\t\tspaces"),            # collapse runs
        (5, "  lead \n trail  "),               # trim + around-newline
        (6, None),                              # NULL propagates
        (7, "é already composed"),         # NFC idempotent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_chars_raw, r.n_chars_norm)
        for r in normalize_text(df).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = con.execute(
        f"SELECT doc_id, {normalize_text_sql('text')} AS text FROM t"
    ).df()
    for _, row in want.iterrows():
        w = None if row.text is None or row.text != row.text else row.text
        assert got[row.doc_id][0] == w, row.doc_id
    # spot-check semantics, not just twin agreement
    assert got[1][0] == "café crema" and got[1][1] == 11 and got[1][2] == 10
    assert got[2][0] == "a\nb\nc" or got[2][0] == "a\nbc"  # stray \r stripped
    assert got[3][0] == "xyz!"
    assert got[4][0] == "too many spaces"
    assert got[5][0] == "lead\ntrail"
    assert got[6][0] is None


def test_regex_token_count_kernel_matches_catalyst(spark, frame):
    """Round-13 kernel: byte-level alnum-run count over JVM-lowered text
    ≡ size(filter(split(lower(text), '[^a-z0-9]+'), t != '')) — edge
    cases plus NULL propagation plus the real sf0.001 corpus."""
    cases = frame.union(
        spark.createDataFrame(
            [
                (100, None),
                (101, "ABC123 def-456__ghi"),
                (102, "---"),
                (103, "é9é9é"),  # non-ASCII separators between digits
                (104, "K kelvin"),  # U+212A lowers into ASCII 'k'
            ],
            "doc_id long, text string",
        )
    )
    both = cases.select(
        "doc_id",
        F.size(T.regex_tokens("text")).alias("spec"),
        K.regex_token_count_kernel(F.lower(F.col("text"))).alias("kernel"),
    )
    for r in both.collect():
        assert r.spec == r.kernel or (
            r.spec is None and r.kernel is None
        ), f"doc {r.doc_id}: {r.spec} != {r.kernel}"
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    diff = corpus.select(
        F.size(T.regex_tokens("text")).alias("spec"),
        K.regex_token_count_kernel(F.lower(F.col("text"))).alias("kernel"),
    ).filter("spec IS DISTINCT FROM kernel")
    assert diff.count() == 0


def test_staged_signals_identical(spark):
    """Round-13 staged signal evaluation (operators/text.py
    signal_stage1_cols / *_cols_bound): the staged form must produce
    bit-identical rows to the unstaged column factories on the real
    corpus — same expressions, evaluated once instead of per textual
    reference."""
    from pyspark.sql import functions as F  # noqa: F811

    from datalake_public_spark.functions import text_funcs as TF
    from datalake_public_spark.operators import text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wide = docs.select("doc_id", "text", TF.tokens("text").alias("__toks"))
    unstaged = wide.select(
        "doc_id",
        *text.token_stat_cols(tok_col="__toks"),
        *text.repetition_cols(tok_col="__toks")[1:],
        *text.quality_cols(tok_col="__toks"),
        *text.language_cols(),
    )
    staged = (
        wide.select(
            "doc_id",
            "text",
            *text.signal_stage1_cols(tok_col="__toks", langs=True),
        )
        .select("*", *text.gram_count_cols())
        .select(
            "doc_id",
            *text.token_stat_cols_bound(use_arrow=False),
            *text.repetition_cols_bound()[1:],
            *text.quality_cols_bound(),
            *text.language_cols_bound(),
        )
    )
    assert staged.columns == unstaged.columns
    assert [f.dataType for f in staged.schema.fields] == [
        f.dataType for f in unstaged.schema.fields
    ]
    a = sorted(map(tuple, staged.collect()))
    b = sorted(map(tuple, unstaged.collect()))
    assert a == b


def test_text_stats_kernel_matches_catalyst(spark):
    """Round-13 mapInArrow text_stats kernel ≡ the staged Catalyst spec
    path — edge cases (NULL text, empty, unicode, PII shapes, repeated
    tokens) and the full sf0.001 corpus, schema included. Both paths
    additionally face the DuckDB oracle hash at every rung."""
    import datalake_public_spark.driver_registry as DR

    cases = [
        (1, "hello world hello"),
        (2, ""),
        (3, None),
        (4, "a@b.co and 1.2.3.4 call +12 345 6789 01 ok"),
        (5, "x " * 500),
        (6, "é ü ñ 中文 token é"),
        (7, "the the the"),
        (8, "  spaces   everywhere  "),
        (9, "K kelvin ABC123"),
        (10, "one"),
    ]
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    orig_t = DR._t
    DR._t = lambda s, sf, t: docs
    try:
        a = DR.text_stats(spark, "x", use_arrow=True)
        b = DR.text_stats(spark, "x", use_arrow=False)
        assert [(f.name, f.dataType) for f in a.schema.fields] == [
            (f.name, f.dataType) for f in b.schema.fields
        ]
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )
    finally:
        DR._t = orig_t
    ka = DR.text_stats(spark, "/root/testdata/sf0.001", use_arrow=True)
    kb = DR.text_stats(spark, "/root/testdata/sf0.001", use_arrow=False)
    assert sorted(map(tuple, ka.collect())) == sorted(map(tuple, kb.collect()))


def test_lang_quality_kernel_matches_catalyst(spark):
    """Round-14 mapInArrow text_lang_quality kernel ≡ the staged
    Catalyst spec path — edge cases (NULL text, empty, zero-token,
    marker ties, zh markers, drop-rule boundaries) and the full sf0.001
    corpus, schema included. Both paths additionally face the DuckDB
    oracle hash at every rung."""
    import datalake_public_spark.driver_registry as DR

    cases = [
        (1, "the the the and of to a"),            # en, short
        (2, ""),
        (3, None),
        (4, "der die und le la les"),              # de/fr tie → de (order)
        (5, "的 是 在 了 不 的"),                     # zh markers
        (6, "x " * 500),                           # repetitive, long
        (7, "el los las y de " * 20),              # es, survives length
        (8, "  spaces   everywhere  "),
        (9, "one"),
        (10, "word " + "unique" + " ".join(f"t{i}" for i in range(60))),
        (11, "de la the el " * 30),                # cross-lang mix
        (12, " " * 10),                            # zero tokens, nonzero chars
    ]
    # the stored n_chars column deliberately DIVERGES from length(text)
    # on doc 1: the output must carry the table column verbatim while
    # the min-chars rule evaluates length(text)
    cases = [
        (i, t, (999 if i == 1 else (len(t) if t is not None else None)))
        for i, t in cases
    ]
    docs = spark.createDataFrame(
        cases, "doc_id long, text string, n_chars long"
    )
    orig_t = DR._t
    DR._t = lambda s, sf, t: docs
    try:
        a = DR.text_lang_quality(spark, "x", use_arrow=True)
        b = DR.text_lang_quality(spark, "x", use_arrow=False)
        assert [(f.name, f.dataType) for f in a.schema.fields] == [
            (f.name, f.dataType) for f in b.schema.fields
        ]
        assert sorted(map(tuple, a.collect()), key=str) == sorted(
            map(tuple, b.collect()), key=str
        )
    finally:
        DR._t = orig_t
    ka = DR.text_lang_quality(spark, "/root/testdata/sf0.001", use_arrow=True)
    kb = DR.text_lang_quality(spark, "/root/testdata/sf0.001", use_arrow=False)
    assert sorted(map(tuple, ka.collect()), key=str) == sorted(
        map(tuple, kb.collect()), key=str
    )
