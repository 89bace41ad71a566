"""Local mimic of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side, then compares
row-count + column names + order-insensitive values (columns sorted by
name, rows sorted by all columns — approximating the driver's value-hash).
Used by tests/test_driver_contract.py and ad-hoc while developing queries.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    """Normalize a cell to a hashable, engine-independent value."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # arrays: Spark → list, DuckDB → numpy array
    if hasattr(v, "tolist"):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        out.append(tuple(_norm_cell(row[c]) for c in cols))
    return sorted(out, key=repr)


def compare(
    spark_df,
    con: duckdb.DuckDBPyConnection,
    sql: str,
    name: str = "?",
    *,
    allow_empty: bool = False,
) -> None:
    """Raise AssertionError with a diff preview on any mismatch.

    Empty results are rejected by default: a 0=0 hash match proves
    nothing, and empty inputs have already masked a real semantics bug
    (exceptAll-vs-subtract) behind trivially-passing oracles."""
    s = spark_df.toPandas()
    o = con.execute(sql).fetchdf()
    assert sorted(s.columns) == sorted(o.columns), (
        f"{name}: column names differ: spark={sorted(s.columns)} oracle={sorted(o.columns)}"
    )
    assert len(s) == len(o), f"{name}: row count differs: spark={len(s)} oracle={len(o)}"
    assert allow_empty or len(s) > 0, (
        f"{name}: query returned 0 rows — a degenerate oracle match; "
        f"make the predicate select real data (or pass allow_empty=True)"
    )
    ns, no = normalize(s), normalize(o)
    if ns != no:
        diffs = [(a, b) for a, b in zip(ns, no) if a != b][:5]
        raise AssertionError(f"{name}: values differ; first diffs:\n" + "\n".join(map(repr, diffs)))
