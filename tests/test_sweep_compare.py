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


# ---------------------------------------------------------------------------
# Round 9 (VERDICT r8 item 5 + ADVICE r8): adversarial pressure on the hash
# comparator's blind spots — both keys actually consulted, the 2M threshold
# edge, temporal-width unification, the column-set contract, and a
# property fuzz over permutations / single-cell mutations / dup-row swaps.
# ---------------------------------------------------------------------------


def test_vector_equal_column_set_mismatch_returns_false():
    """ADVICE r8: the hash path indexed o_tbl by s_tbl's column names and
    raised KeyError on a column-set mismatch instead of honoring the
    documented False contract. Both paths, both directions."""
    a = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    b = pa.table({"y": pa.array([1, 2, 3], pa.int64())})
    assert vector_equal(a, b) is False
    assert vector_equal(a, b, hash_rows=0) is False
    assert vector_equal(b, a, hash_rows=0) is False
    wide = pa.table(
        {"x": pa.array([1, 2, 3], pa.int64()), "z": pa.array([0, 0, 0], pa.int64())}
    )
    # same row count, subset columns — select() would raise KeyError
    assert vector_equal(wide.select(["x"]), b, hash_rows=0) is False


def test_hash_path_normalizes_temporal_width():
    """ADVICE r8: _canon_type unifies timestamp units to 'us', so a
    timestamp[ms] vs timestamp[us] pair passes the type gate — the raw
    bit-view hashed UNIT COUNTS and would call equal values unequal
    (silent slow-path fallback at best). Now the hash path casts to 'us'
    (and date64→date32) before the bit-view."""
    ms = pa.table({"t": pa.array([1_000, 2_000], pa.timestamp("ms"))})
    us = pa.table({"t": pa.array([1_000_000, 2_000_000], pa.timestamp("us"))})
    assert vector_equal(ms, us, hash_rows=0) is True
    ns = pa.table(
        {"t": pa.array([1_000_000_000, 2_000_000_000], pa.timestamp("ns"))}
    )
    assert vector_equal(ns, us, hash_rows=0) is True
    off = pa.table({"t": pa.array([1_000_000, 2_000_001], pa.timestamp("us"))})
    assert vector_equal(ms, off, hash_rows=0) is False
    d32 = pa.table({"d": pa.array([1, 2], pa.date32())})
    d64 = pa.table({"d": pa.array([86_400_000, 172_800_000], pa.date64())})
    assert vector_equal(d32, d64, hash_rows=0) is True
    d64_off = pa.table({"d": pa.array([86_400_000, 259_200_000], pa.date64())})
    assert vector_equal(d32, d64_off, hash_rows=0) is False


def test_single_degenerate_key_cannot_false_accept(monkeypatch):
    """Collision-shaped near-miss (VERDICT r8 item 5): simulate a full
    multiset collision under ONE keyed digest by zeroing that key's
    finalizer — the other key must still catch a real difference. Proves
    vector_equal consults BOTH digests, so a false accept requires a
    simultaneous collision under two different finalizer permutations."""
    a = pa.table(
        {
            "i": pa.array([1, 2, 3, 4], pa.int64()),
            "s": pa.array(["a", "b", "c", "d"]),
        }
    )
    b = pa.table(
        {
            "i": pa.array([1, 2, 3, 5], pa.int64()),
            "s": pa.array(["a", "b", "c", "d"]),
        }
    )
    real = scale_sweep._mix64
    for dead in (0, 1):

        def fake(x, salt, params=scale_sweep._MIXER_PARAMS[0], _dead=dead):
            if params is scale_sweep._MIXER_PARAMS[_dead]:
                return np.zeros(len(x), dtype=np.uint64)
            return real(x, salt, params)

        monkeypatch.setattr(scale_sweep, "_mix64", fake)
        assert vector_equal(a, b, hash_rows=0) is False, f"key {1 - dead} blind"
        assert vector_equal(a, a.take(pa.array([3, 1, 0, 2])), hash_rows=0) is True


def test_hash_rows_threshold_is_strictly_greater(monkeypatch):
    """The hash path engages strictly ABOVE hash_rows (num_rows >
    hash_rows): at exactly the threshold the sort path runs. Spy on
    _sorted_row_hashes to pin which side of the boundary each call took,
    and that both verdicts agree at the edge."""
    calls = []
    real = scale_sweep._sorted_row_hashes

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(scale_sweep, "_sorted_row_hashes", spy)
    t = pa.table({"i": pa.array(list(range(10)), pa.int64())})
    assert vector_equal(t, t, hash_rows=10) is True  # == threshold: sort path
    assert calls == []
    assert vector_equal(t, t, hash_rows=9) is True  # > threshold: hash path
    assert len(calls) == 2
    mut = pa.table({"i": pa.array(list(range(9)) + [99], pa.int64())})
    assert vector_equal(t, mut, hash_rows=10) is False
    assert vector_equal(t, mut, hash_rows=9) is False


def test_duplicated_row_swap_is_caught():
    """Multiset semantics: {A,A,B} vs {A,B,B} has equal row SETS and
    equal counts — only per-row multiplicities differ."""
    a = pa.table({"k": pa.array([1, 1, 2], pa.int64()), "s": pa.array(["x", "x", "y"])})
    b = pa.table({"k": pa.array([1, 2, 2], pa.int64()), "s": pa.array(["x", "y", "y"])})
    assert vector_equal(a, b) is False
    assert vector_equal(a, b, hash_rows=0) is False
    assert fast_rows(a.to_pandas()) != fast_rows(b.to_pandas())


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def test_property_permutation_equal_and_mutation_caught(data):
        """Fuzz (VERDICT r8 item 5): any row permutation of a mixed-dtype
        table is strict-equal under BOTH comparator paths and fast_rows;
        any single-cell change to a guaranteed-absent sentinel is caught
        by both paths. Floats include NaN/±inf/-0.0, every column draws
        nulls (except float, whose null story is covered above)."""
        n = data.draw(st.integers(2, 24))
        ints = data.draw(
            st.lists(
                st.one_of(st.none(), st.integers(-(2**40), 2**40)),
                min_size=n,
                max_size=n,
            )
        )
        fls = data.draw(
            st.lists(
                st.floats(allow_nan=True, allow_infinity=True, width=64),
                min_size=n,
                max_size=n,
            )
        )
        strs = data.draw(
            st.lists(st.one_of(st.none(), st.text(max_size=6)), min_size=n, max_size=n)
        )
        bls = data.draw(
            st.lists(st.one_of(st.none(), st.booleans()), min_size=n, max_size=n)
        )
        a = pa.table(
            {
                "i": pa.array(ints, pa.int64()),
                "f": pa.array(fls, pa.float64()),
                "s": pa.array(strs, pa.string()),
                "b": pa.array(bls, pa.bool_()),
            }
        )
        order = data.draw(st.permutations(list(range(n))))
        b = a.take(pa.array(order))
        assert vector_equal(a, b) is True
        assert vector_equal(a, b, hash_rows=0) is True
        assert fast_rows(a.to_pandas()) == fast_rows(b.to_pandas())

        row = data.draw(st.integers(0, n - 1))
        col = data.draw(st.sampled_from(["i", "f", "s", "b"]))
        cols = {c: a.column(c).to_pylist() for c in a.column_names}
        cur = cols[col][row]
        if col == "b":
            sent = None if cur is not None else True
        else:
            sent = {"i": 999_999_999_999, "f": 1.2345678e30, "s": "\u27c2MUT\u27c2"}[col]
            if cur is not None and cur == sent:
                sent = {"i": sent + 1, "f": -sent, "s": sent + "2"}[col]
        cols[col][row] = sent
        c = pa.table(
            {k: pa.array(v, a.schema.field(k).type) for k, v in cols.items()}
        )
        assert vector_equal(a, c) is False
        assert vector_equal(a, c, hash_rows=0) is False
        assert fast_rows(a.to_pandas()) != fast_rows(c.to_pandas())


def test_nul_byte_strings_are_distinguished():
    """Round-9 fuzz find: pandas' default categorize path factorizes
    strings through a C-string hashtable that truncates at the first NUL
    byte — "a" and "a\x00" unified (false ACCEPT under both keys, since
    the keyed siphash sits above the conflation) and the surviving
    representative depended on first-seen order (false REJECT on equal
    multisets). categorize=False hashes length-aware; both directions
    pinned here."""
    a = pa.table({"s": pa.array(["a", "b"])})
    b = pa.table({"s": pa.array(["a\x00", "b"])})
    assert vector_equal(a, b, hash_rows=0) is False  # was True (conflated)
    assert vector_equal(a, b) is False
    # the shrunk falsifying example: dictionary order flipped by a
    # permutation, equal multisets must stay equal
    strs = [None] * 11 + [""] * 7 + ["\x00"]
    t = pa.table({"s": pa.array(strs, pa.string())})
    perm = t.take(pa.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 18, 12, 13, 14, 15, 16, 17, 11]))
    assert vector_equal(t, perm, hash_rows=0) is True  # was False


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))


def test_derived_sub_blocks_reproduces_established_rungs():
    """The cosine twin's sub-block count is derived from the embeddings
    row count (round 9 — the manual SWEEP_COSINE_SUB_BLOCKS=512 protocol
    was forgotten twice across rounds and burned ~25 and ~75 min). The
    derivation must reproduce the committed artifacts' coverage notes at
    both established rungs, and scale sanely beyond them."""
    import unittest.mock as mock

    def at(n):
        m = mock.MagicMock()
        m.metadata.num_rows = n
        with mock.patch("pyarrow.parquet.ParquetFile", return_value=m):
            return scale_sweep.derived_sub_blocks("/ignored")

    assert at(20_000) == 16       # ×10 rung (committed note: vec_id%16)
    assert at(200_000) == 512     # ×100 rung (committed note: vec_id%512)
    assert at(2_000_000) == 16384  # ×1000: B keeps pairs ~constant
    assert at(2_000) == 1          # tiny corpus: full within-label pairs
    # missing/unreadable fixture falls back to the historical default
    assert scale_sweep.derived_sub_blocks("/nonexistent_dir_xyz") == 16


def test_host_canary_shape_and_sanity(spark):
    """The calibration canary (round 11 — VERDICT r10 item 1) must
    return both probe timings as positive floats. The probe CODE is
    frozen (a changed canary can't calibrate across rounds) — this pin
    is shape-only by design so legitimate host speed never fails CI."""
    from tools.host_canary import host_canary

    c = host_canary(spark)
    assert set(c) == {"codegen_s", "shuffle_s"}
    assert all(isinstance(v, float) and v > 0 for v in c.values())
