"""Skew-mitigation operators: salted aggregation and salted join.

At 100 TB a handful of hot keys (the boilerplate document, the bot user,
the default station) can put 100× the median load on one reduce task.
AQE's skew-join handling splits oversized SHUFFLE partitions, but (a)
only for joins, (b) only after the map stage materializes them. These
operators pre-split hot keys deterministically:

  * salted aggregation — two-stage: partial agg on (key, salt) spreads a
    hot key over n_salt reducers, final agg on key merges the partials.
    Works for any algebraic aggregate (sum/count/min/max — the merge is
    the same function; avg must be decomposed into sum+count).
  * salted join — replicate the SMALL side n_salt times, salt the large
    side's rows deterministically; the join key becomes (key, salt) so a
    hot key's rows land on n_salt reducers instead of one.

Both are semantics-preserving rewrites (driver-checked against plain
GROUP BY / JOIN oracles). Salt is derived from xxhash64 of stable row
columns — deterministic, no RNG in executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# merge function per algebraic aggregate: how partials combine
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": lambda c: F.count(c), "min": F.min, "max": F.max}


def _salt(cols: list[str], n_salt: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salt: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) → groupBy(keys).

    ``aggs`` maps output name → (input col, fn) with fn in
    sum/count/min/max. ``salt_cols`` are the columns hashed into the
    salt — default: every non-key column used by the aggregates, which
    spreads a hot key's rows ~uniformly."""
    bad = [f for _, (_, f) in aggs.items() if f not in _PARTIAL]
    if bad:
        raise ValueError(f"non-algebraic aggregate(s): {bad}; decompose first")
    salt_src = salt_cols or sorted({c for _, (c, _) in aggs.items()})
    salted = df.withColumn("__salt", _salt(salt_src, n_salt))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_PARTIAL[f](c).alias(name) for name, (c, f) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[f](name).alias(name) for name, (_, f) in aggs.items()]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salt: int = 8,
    how: str = "inner",
    large_salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the large side, replicate the small
    side ×n_salt, join on (key, salt).

    Cost model: small side grows n_salt×— only viable when |small| ≪
    |large| (the usual skew scenario: fact × dimension with hot dim
    keys). For small sides under the broadcast threshold prefer
    ``broadcast(small)`` — salting is for the in-between regime where
    the dim exceeds broadcast size AND keys are hot."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    salt_src = large_salt_cols or [c for c in large.columns if c != on][:2] or [on]
    l_salted = large.withColumn("__salt", _salt(salt_src, n_salt))
    s_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    return l_salted.join(s_rep, [on, "__salt"], how).drop("__salt")
