"""BM25 retrieval operator: scoring semantics, determinism, oracle parity.

The operator's contract is exact-integer scoring (log-free probabilistic
idf as int64 ratios — operators/retrieval.py docstring), so the DuckDB
twin must match bit-for-bit including ranks, not just approximately.
"""

from __future__ import annotations

import pytest

from datalake_public_spark.operators.retrieval import (
    DRIVER_QUERIES,
    bm25_topk,
    bm25_topk_sql,
)
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection


def _q(spark, rows):
    return spark.createDataFrame(rows, "query_id int, qtext string")


def test_bm25_ranks_matching_doc_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple apple apple apple"),
            (3, "dog cat fish"),
            (4, "apple dog"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, _q(spark, [(1, "apple")]), k=10).collect()
    ids = [r.doc_id for r in out]
    # doc 3 has no query term — absent; repeated-term doc 2 outranks
    # single-occurrence docs; shorter doc 4 outranks longer doc 1
    assert 3 not in ids
    assert ids[0] == 2
    assert ids.index(4) < ids.index(1)
    assert [r.rk for r in out] == list(range(1, len(out) + 1))


def test_bm25_score_hand_computed(spark):
    # one doc, one term: N=1, df=1, tf=2, dl=2, avgdl=2
    # idf = (2-2+1)/(2+1) = 1/3; tf_part = 44*2*2/(20*2*2+6*2+18*2) = 176/128
    # score = half_up(10000 * 176 / (3*128)) = half_up(1760000/384) = 4583
    docs = spark.createDataFrame([(7, "x x")], "doc_id long, text string")
    out = bm25_topk(docs, _q(spark, [(1, "x")]), k=1).collect()
    assert len(out) == 1
    assert (out[0].doc_id, out[0].score, out[0].rk) == (7, 4583, 1)


def test_bm25_multi_term_sums_and_ties_break_by_doc_id(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, _q(spark, [(1, "a b")]), k=3).collect()
    by_id = {r.doc_id: r for r in out}
    # docs 1 and 2 are identical → identical scores, doc 1 ranks first
    assert by_id[1].score == by_id[2].score
    assert (by_id[1].rk, by_id[2].rk) == (1, 2)
    # doc 3 matches only 'a' → strictly lower score, rank 3
    assert by_id[3].score < by_id[1].score
    assert by_id[3].rk == 3


def test_bm25_duplicate_query_terms_count_once(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    once = bm25_topk(docs, _q(spark, [(1, "a")]), k=1).collect()[0].score
    twice = bm25_topk(docs, _q(spark, [(1, "a a")]), k=1).collect()[0].score
    assert once == twice  # array_distinct on query terms


def test_bm25_oracle_parity_on_testdata(spark):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    )
    q = _q(spark, list(DRIVER_QUERIES))
    con = duck_connection(SF_SMOKE)
    try:
        compare(bm25_topk(docs, q, k=10), con, bm25_topk_sql(k=10), "bm25")
    finally:
        con.close()


def test_bm25_no_matching_terms_yields_empty(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert bm25_topk(docs, _q(spark, [(1, "zzz")]), k=5).count() == 0


def test_bm25_prebuilt_equals_inline(spark, tmp_path):
    """build-once-probe-many: the prebuilt index path must return the
    EXACT (query_id, doc_id, score, rk) set as the inline path — shared
    scoring tail, so a drift here means the index write/read lost rows
    or types.

    Coverage note (ADVICE r8): since r8 the DRIVER's vocab_familiarity
    'inline' side scores from the same checkpointed tf parquet the
    prebuilt side reads, so its internal exceptAll no longer exercises
    the bucketed tf WRITE path independently. This test is the in-repo
    backstop: ``bm25_topk(docs, …)`` here takes raw documents.parquet
    text through the full tokenize path (no index), so a bucketed-write
    bug diverges from it and fails below."""
    from datalake_public_spark.operators.retrieval import (
        bm25_build_index,
        bm25_topk_prebuilt,
    )

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    )
    q = _q(spark, list(DRIVER_QUERIES))
    root = str(tmp_path / "idx")
    bm25_build_index(docs, root)
    inline = sorted(map(tuple, bm25_topk(docs, q, k=10).collect()))
    prebuilt = sorted(map(tuple, bm25_topk_prebuilt(spark, root, q, k=10).collect()))
    assert inline == prebuilt
    assert len(inline) == 40


def test_bm25_extend_index_incremental_and_idempotent(spark, tmp_path):
    """Continuous-corpus contract: build on half the corpus, extend with
    the other half (and REPLAY the extension, simulating a foreachBatch
    restart) — the extended index must answer exactly like an inline run
    over the full corpus, and the replay must not duplicate anything."""
    from datalake_public_spark.operators.retrieval import (
        bm25_build_index,
        bm25_extend_index,
        bm25_topk_prebuilt,
    )
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    )
    first, second = docs.filter(F.col("doc_id") % 2 == 0), docs.filter(
        F.col("doc_id") % 2 == 1
    )
    q = _q(spark, list(DRIVER_QUERIES))
    root = str(tmp_path / "idx")
    bm25_build_index(first, root)
    bm25_extend_index(second, root, "b1")
    bm25_extend_index(second, root, "b1")  # replay — must be a no-op
    extended = sorted(map(tuple, bm25_topk_prebuilt(spark, root, q, k=10).collect()))
    inline = sorted(map(tuple, bm25_topk(docs, q, k=10).collect()))
    assert extended == inline
    with pytest.raises(ValueError, match="reserved"):
        bm25_extend_index(second, root, "base")


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))


def test_bm25_build_index_with_tokens_df_identical(spark, tmp_path):
    """Round 12: an index built from a shared pre-tokenized frame must be
    byte-for-byte equivalent to the standalone build — identical tf rows,
    dfreq, stats, and therefore identical prebuilt top-k."""
    from pyspark.sql import functions as F

    from datalake_public_spark.functions import text_funcs as T
    from datalake_public_spark.operators.retrieval import (
        DRIVER_QUERIES,
        bm25_build_index,
        bm25_topk_prebuilt,
    )

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    tok = docs.select(F.col("doc_id"), T.tokens("text").alias("toks"))
    r_std, r_tok = str(tmp_path / "std"), str(tmp_path / "tok")
    bm25_build_index(docs, r_std)
    bm25_build_index(docs, r_tok, tokens_df=tok)
    for part in ("tf", "dfreq", "stats"):
        a = spark.read.parquet(f"{r_std}/{part}")
        b = spark.read.parquet(f"{r_tok}/{part}")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, part
    qdf = spark.createDataFrame(list(DRIVER_QUERIES), "query_id int, qtext string")
    a = sorted(map(tuple, bm25_topk_prebuilt(spark, r_std, qdf, k=10).collect()))
    b = sorted(map(tuple, bm25_topk_prebuilt(spark, r_tok, qdf, k=10).collect()))
    assert a == b and len(a) > 0
