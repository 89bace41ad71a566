"""Pin tools/scale_sweep.vector_equal to the per-row fast_rows contract.

The ×100 sweep's wall time was dominated by the pure-Python per-row
comparator, not the engines (sessionize: 9.5M rows ≈ 830 s mostly
compare).  vector_equal is the Arrow-native strict path; these tests
prove it agrees with fast_rows on every decision it makes, declines
(None) exactly where the per-row canonicalization is required, and
honors the harness's tz / NaN / null contracts.
"""

from __future__ import annotations

import datetime
import importlib.util
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location(
    "scale_sweep", os.path.join(REPO, "tools", "scale_sweep.py")
)
scale_sweep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scale_sweep)

vector_equal = scale_sweep.vector_equal
fast_rows = scale_sweep.fast_rows


def _base_table() -> pa.Table:
    return pa.table(
        {
            "i": pa.array([3, 1, 2, None, 2], type=pa.int64()),
            "f": pa.array([1.5, float("nan"), -0.0, 2.25, None]),
            "s": pa.array(["b", None, "a", "a", "z"]),
            "t": pa.array(
                [
                    datetime.datetime(2024, 1, 1, 12, 0, 0),
                    datetime.datetime(2024, 1, 2),
                    None,
                    datetime.datetime(2024, 1, 1, 12, 0, 0),
                    datetime.datetime(2023, 12, 31, 23, 59, 59),
                ],
                type=pa.timestamp("us"),
            ),
        }
    )


def _permuted(tbl: pa.Table, order: list[int]) -> pa.Table:
    return tbl.take(pa.array(order))


def test_permutation_is_strict_equal():
    a = _base_table()
    b = _permuted(a, [4, 2, 0, 3, 1])
    assert vector_equal(a, b) is True
    assert fast_rows(a.to_pandas()) == fast_rows(b.to_pandas())


def test_changed_cell_detected_by_both_paths():
    a = _base_table()
    pdf = a.to_pandas()
    pdf.loc[2, "s"] = "MUTATED"
    b = pa.Table.from_pandas(pdf, schema=a.schema, preserve_index=False)
    assert vector_equal(a, b) is False
    assert fast_rows(a.to_pandas()) != fast_rows(b.to_pandas())


def test_nan_vs_number_is_unequal_but_nan_vs_nan_is_equal():
    a = pa.table({"f": pa.array([1.0, float("nan")])})
    same = pa.table({"f": pa.array([float("nan"), 1.0])})
    diff = pa.table({"f": pa.array([1.0, 2.0])})
    assert vector_equal(a, same) is True
    assert vector_equal(a, diff) is False
    assert fast_rows(a.to_pandas()) == fast_rows(same.to_pandas())
    assert fast_rows(a.to_pandas()) != fast_rows(diff.to_pandas())


def test_null_vs_value_is_unequal():
    a = pa.table({"i": pa.array([1, None], type=pa.int64())})
    b = pa.table({"i": pa.array([1, 2], type=pa.int64())})
    assert vector_equal(a, b) is False


def test_tz_aware_vs_naive_same_wall_clock_is_equal():
    # Spark's Arrow export annotates tz=UTC; DuckDB's is naive. Session
    # tz is pinned UTC, so equal wall clocks must compare equal — the
    # _norm_cell contract.
    naive = pa.table(
        {"t": pa.array([datetime.datetime(2024, 5, 1, 8, 30)], type=pa.timestamp("us"))}
    )
    aware = pa.table(
        {
            "t": pa.array(
                [datetime.datetime(2024, 5, 1, 8, 30)],
                type=pa.timestamp("us", tz="UTC"),
            )
        }
    )
    assert vector_equal(aware, naive) is True
    assert fast_rows(aware.to_pandas()) == fast_rows(naive.to_pandas())


def test_non_utc_tz_annotation_fails_schema_check():
    # Round-6 regression pin: DuckDB TIMESTAMPTZ exports as
    # tz='Etc/UTC', which the driver treats as a schema mismatch vs
    # Spark's tz='UTC' (or naive). The harness canonicalizer must
    # PRESERVE any non-'UTC' tz so assert_types_match fails locally —
    # r6 shipped two red driver rows because it erased all tz info.
    from tests.oracle_harness import _canon_type, assert_types_match

    etc = pa.timestamp("us", tz="Etc/UTC")
    assert _canon_type(etc) == etc  # preserved, not erased
    assert _canon_type(pa.timestamp("us", tz="UTC")) == pa.timestamp("us")
    assert _canon_type(pa.timestamp("ns")) == pa.timestamp("us")
    wall = datetime.datetime(2024, 5, 1, 8, 30)
    spark_side = pa.table({"t": pa.array([wall], type=pa.timestamp("us", tz="UTC"))})
    duck_tz = pa.table({"t": pa.array([wall], type=etc)})
    with pytest.raises(AssertionError, match="DTYPES"):
        assert_types_match(spark_side, duck_tz, "etc-utc-pin")


def test_nested_and_decimal_columns_decline_to_fast_rows():
    nested = pa.table({"a": pa.array([[1, 2], [3]], type=pa.list_(pa.int64()))})
    assert vector_equal(nested, nested) is None
    dec = pa.table({"d": pa.array([1, 2], type=pa.decimal128(10, 2))})
    assert vector_equal(dec, dec) is None


def test_row_count_mismatch_is_false():
    a = _base_table()
    assert vector_equal(a, a.slice(0, 3)) is False


def test_large_permuted_table_roundtrip():
    rng = np.random.default_rng(7)
    n = 50_000
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 1_000, n),
            "v": rng.standard_normal(n).round(6),
            "s": pd.Series(rng.integers(0, 26, n)).map(lambda i: chr(97 + i) * 3),
        }
    )
    a = pa.Table.from_pandas(pdf, preserve_index=False)
    b = pa.Table.from_pandas(
        pdf.sample(frac=1.0, random_state=11).reset_index(drop=True),
        preserve_index=False,
    )
    assert vector_equal(a, b) is True
    pdf2 = pdf.copy()
    pdf2.loc[n - 1, "v"] += 1e-7  # below round-trip display noise, still strict
    c = pa.Table.from_pandas(pdf2, preserve_index=False)
    assert vector_equal(a, c) is False


def test_hash_compare_path_agrees_with_sort_path():
    """Round 8 (VERDICT r7 item 4): above ``hash_rows`` vector_equal
    compares sorted row-hash multisets instead of multi-column-sorting
    the tables. Forcing the hash path with hash_rows=0 must reproduce
    the sort path's verdicts exactly: permutation-equal → True, a single
    mutated cell → False (which falls back to the diff path in the
    sweep), NaN multiset semantics preserved."""
    a = _base_table()
    b = _permuted(a, [4, 2, 0, 3, 1])
    assert vector_equal(a, b, hash_rows=0) is True
    pdf = a.to_pandas()
    pdf.loc[2, "s"] = "MUTATED"
    c = pa.Table.from_pandas(pdf, schema=a.schema, preserve_index=False)
    assert vector_equal(a, c, hash_rows=0) is False
    nan_a = pa.table({"f": pa.array([1.0, float("nan")])})
    nan_same = pa.table({"f": pa.array([float("nan"), 1.0])})
    nan_diff = pa.table({"f": pa.array([1.0, 2.0])})
    assert vector_equal(nan_a, nan_same, hash_rows=0) is True
    assert vector_equal(nan_a, nan_diff, hash_rows=0) is False
    # large-table determinism: permuted 50k-row table hashes equal, a
    # one-cell mutation is caught (the deliberate-mismatch pin)
    rng = np.random.default_rng(13)
    n = 50_000
    big = pd.DataFrame(
        {
            "k": rng.integers(0, 1_000, n),
            "v": rng.standard_normal(n).round(6),
            "s": pd.Series(rng.integers(0, 26, n)).map(
                lambda i: chr(97 + i) * 3
            ),
        }
    )
    ta = pa.Table.from_pandas(big, preserve_index=False)
    tb = pa.Table.from_pandas(
        big.sample(frac=1.0, random_state=3).reset_index(drop=True),
        preserve_index=False,
    )
    assert vector_equal(ta, tb, hash_rows=0) is True
    big2 = big.copy()
    big2.loc[n // 2, "v"] += 1e-9
    tc = pa.Table.from_pandas(big2, preserve_index=False)
    assert vector_equal(ta, tc, hash_rows=0) is False
    # the raw-type hash path must honor the canon-type unifications it
    # skips: tz=UTC vs naive (same UTC micros) and string vs large_string
    wall = datetime.datetime(2024, 5, 1, 8, 30)
    aware = pa.table(
        {"t": pa.array([wall], type=pa.timestamp("us", tz="UTC"))}
    )
    naive = pa.table({"t": pa.array([wall], type=pa.timestamp("us"))})
    assert vector_equal(aware, naive, hash_rows=0) is True
    small = pa.table({"s": pa.array(["a", "b", None])})
    large = pa.table(
        {"s": pa.array(["b", None, "a"], type=pa.large_string())}
    )
    assert vector_equal(small, large, hash_rows=0) is True
    # nested/decimal columns decline the hash path too (fall to canon)
    dec = pa.table({"d": pa.array([1, 2], type=pa.decimal128(10, 2))})
    assert vector_equal(dec, dec, hash_rows=0) is None


def test_oracle_cache_rejects_foreign_owned_dir(tmp_path, monkeypatch):
    """ADVICE r7: a cache dir owned by another uid must be refused, not
    trusted (predictable /tmp path → planted-parquet oracle forgery).
    Simulated by monkeypatching os.getuid to a foreign id — the check
    compares dir ownership against the CURRENT uid before any read."""
    import duckdb

    cache = tmp_path / "cache"
    monkeypatch.setenv("SWEEP_ORACLE_CACHE", str(cache))
    con = duckdb.connect()
    scale_sweep.oracle_cached(con, "own", "SELECT 1 AS x", "s0")  # creates
    real_uid = os.getuid()
    monkeypatch.setattr(os, "getuid", lambda: real_uid + 1)
    with pytest.raises(RuntimeError, match="owned by uid"):
        scale_sweep.oracle_cached(con, "own", "SELECT 1 AS x", "s0")


def test_oracle_cache_skips_tempdir_sql_and_keys_on_duckdb_version(
    tmp_path, monkeypatch
):
    """ADVICE r7: (a) SQL embedding per-process temp paths never hits —
    don't write dead files for it; (b) the key folds in duckdb
    __version__ so an upgraded engine can't be compared against a stale
    pre-upgrade oracle."""
    import glob
    import tempfile as _tf

    import duckdb

    cache = tmp_path / "cache"
    monkeypatch.setenv("SWEEP_ORACLE_CACHE", str(cache))
    con = duckdb.connect()
    temp_sql = f"SELECT len('{_tf.gettempdir()}/x_123') AS n"
    _, hit = scale_sweep.oracle_cached(con, "tmpsql", temp_sql, "s0")
    assert hit is False
    assert glob.glob(str(cache / "tmpsql_*")) == []  # nothing written
    stable_sql = "SELECT 42 AS n"
    scale_sweep.oracle_cached(con, "ver", stable_sql, "s0")
    (path,) = glob.glob(str(cache / "ver_*"))
    monkeypatch.setattr(duckdb, "__version__", "999.0.0-test")
    _, hit2 = scale_sweep.oracle_cached(con, "ver", stable_sql, "s0")
    assert hit2 is False  # version bump → key miss, no stale serve


def test_oracle_cache_roundtrip_preserves_strict_dtypes(tmp_path, monkeypatch):
    """The sweep's oracle cache (round 7) must hand back EXACTLY what
    DuckDB produced: a parquet roundtrip that widened an int, dropped a
    decimal, or re-annotated a timestamp would corrupt the strict
    compare silently. Also pins the key contract: same SQL+fixtures hit,
    different SQL miss."""
    import duckdb

    monkeypatch.setenv("SWEEP_ORACLE_CACHE", str(tmp_path / "cache"))
    con = duckdb.connect()
    sql = (
        "SELECT 1::BIGINT AS b, 2::INT AS i, 1.5::DOUBLE AS f, "
        "CAST('2024-05-01 08:30:00' AS TIMESTAMP) AS t, "
        "CAST(12.34 AS DECIMAL(10,2)) AS d, 'x' AS s"
    )
    cold, hit0 = scale_sweep.oracle_cached(con, "pin", sql, "sig0")
    warm, hit1 = scale_sweep.oracle_cached(con, "pin", sql, "sig0")
    assert (hit0, hit1) == (False, True)
    assert warm.schema == cold.schema  # exact Arrow types, no widening
    assert warm.equals(cold)
    # a different oracle SQL can never collide with the cached answer
    other, hit2 = scale_sweep.oracle_cached(
        con, "pin", sql.replace("1::BIGINT", "9::BIGINT"), "sig0"
    )
    assert hit2 is False
    assert other.column("b").to_pylist() == [9]
    # a regenerated fixture (new signature) also misses
    _, hit3 = scale_sweep.oracle_cached(con, "pin", sql, "sig1")
    assert hit3 is False


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
