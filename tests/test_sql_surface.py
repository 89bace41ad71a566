"""Pure-SQL surface: spark.sql over the registered views must match the
Python API operator-for-operator (same plans, same results)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_public_spark.operators import dedup, text
from datalake_public_spark.plans.sql_surface import register_analytics_views
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    return register_analytics_views(spark, SF_SMOKE)


def test_registers_base_and_derived(spark, views):
    assert "documents" in views and "doc_signals" in views
    assert spark.sql("SELECT count(*) AS n FROM documents").first().n == 500


def test_sql_doc_signals_equals_python_api(spark):
    got = spark.sql(
        "SELECT doc_id, n_ws_tokens, quality, pred_lang FROM doc_signals"
    ).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    want = text.doc_signals(docs).select(
        "doc_id", "n_ws_tokens", "quality", "pred_lang"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_sql_quality_audit_is_filterable(spark):
    survivors = spark.sql(
        "SELECT count(*) AS n FROM doc_quality_audit WHERE drop_reasons_csv = ''"
    ).first().n
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert survivors == text.quality_filter(docs).count()


def test_sql_dedup_view_equals_operator(spark):
    got = spark.sql(
        "SELECT content_hash, keep_id, n_copies FROM dedup_exact_docs"
    ).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    want = dedup.exact_dedup(docs).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_sql_vocab_top10_and_joinability(spark):
    # views compose in SQL: join vocab against signals in one statement
    top = spark.sql(
        """
        SELECT token FROM corpus_vocab
        ORDER BY n_occurrences DESC, token LIMIT 10
        """
    ).collect()
    assert len(top) == 10
    joined = spark.sql(
        """
        SELECT s.pred_lang, count(*) AS n
        FROM doc_signals s JOIN doc_fingerprints f USING (doc_id)
        GROUP BY s.pred_lang
        """
    )
    assert joined.agg(F.sum("n")).first()[0] == 500
