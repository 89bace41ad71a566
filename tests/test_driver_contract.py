"""Driver-contract regression: every queries() entry vs its DuckDB oracle
at sf0.001 (the driver runs the same comparison at sf0.01 — this is the
fast local mirror of that gate)."""

from __future__ import annotations

import pytest

from datalake_public_spark.driver_queries import REGISTRY
from datalake_public_spark.driver_queries_ext import EXT_REGISTRY
from datalake_public_spark.driver_queries_llm import LLM_REGISTRY
from datalake_public_spark.driver_queries_streaming import STREAMING_REGISTRY
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection

ALL = {**REGISTRY, **LLM_REGISTRY, **EXT_REGISTRY, **STREAMING_REGISTRY}


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(spark, con, name):
    spec = ALL[name]
    df = spec.spark(spark, SF_SMOKE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only contract (driver's weaker check)
        assert len(df.columns) > 0
    else:
        compare(df, con, spec.oracle, name)


def test_harness_is_dtype_strict(spark, con):
    """The harness must reproduce the round-1 driver failures: identical
    VALUES but different result dtypes (HUGEINT from sum(BIGINT), DATE from
    date_trunc, BIGINT from year()) have to fail locally."""
    one_long = spark.sql("SELECT CAST(1996 AS BIGINT) AS v")
    with pytest.raises(AssertionError, match="DTYPES"):
        # DuckDB sum(BIGINT) widens to HUGEINT (decimal128) — same value 1996
        compare(one_long, con, "SELECT sum(v) AS v FROM (SELECT CAST(1996 AS BIGINT) AS v)",
                "hugeint-vs-bigint")
    ts = spark.sql("SELECT TIMESTAMP '1996-01-01 00:00:00' AS d")
    with pytest.raises(AssertionError, match="DTYPES"):
        compare(ts, con, "SELECT DATE '1996-01-01' AS d", "date-vs-timestamp")
    y = spark.sql("SELECT CAST(1996 AS INT) AS y")
    with pytest.raises(AssertionError, match="DTYPES"):
        compare(y, con, "SELECT CAST(1996 AS BIGINT) AS y", "int-width")


def test_harness_rejects_duckdb_timestamptz(spark, con):
    """Round-6 driver regression pin: DuckDB's to_timestamp()/timezone()
    return TIMESTAMPTZ, whose Arrow export is timestamp[us, tz='Etc/UTC'].
    The driver's canonicalizer equates only naive ↔ tz='UTC' and flags
    any other tz annotation as a schema mismatch — two entries shipped
    red in r6 because the old harness erased ALL tz annotations. The
    uncast oracle must fail locally; CAST(... AS TIMESTAMP) must pass."""
    ts = spark.sql("SELECT TIMESTAMP '1970-01-01 00:00:00' AS t")
    with pytest.raises(AssertionError, match="DTYPES"):
        compare(ts, con, "SELECT to_timestamp(0) AS t", "timestamptz-uncast")
    # the documented fix shape: cast to naive TIMESTAMP in the oracle SQL
    compare(ts, con, "SELECT CAST(to_timestamp(0) AS TIMESTAMP) AS t",
            "timestamptz-cast")


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    df = m.entry(spark)
    assert df.count() > 0
    assert set(m.oracle_sql()) <= set(m.queries())
