"""Join-strategy operators Spark lacks natively.

``binned_range_join`` — the SCALE path for range/band joins. Spark plans a
plain ``value BETWEEN lo AND hi`` join as BroadcastNestedLoopJoin (fine
when one side is tiny — see driver_queries_ext.range_join) or, when
neither side broadcasts, as a cartesian — quadratic and fatal at 100 TB.
The binned formulation turns the theta join into an EQUI join:

  * facts key by ``bin = floor(value / bin_width)`` (one bin per row);
  * ranges explode to every bin their [lo, hi) interval covers;
  * hash-join on ``bin``, then re-check the exact residual predicate.

Each fact row meets each covering range exactly once (its single bin is
covered once per range), so no dedup is needed. Cost: |ranges| rows
multiply by span/bin_width — pick ``bin_width`` near the median range
span so the explode factor stays O(1) and the join is one hash shuffle
on a well-distributed integer key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    facts: DataFrame,
    ranges: DataFrame,
    *,
    value_col: str = "value",
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 50.0,
    how: str = "inner",
) -> DataFrame:
    """Equi-join formulation of ``facts.value ∈ [lo, hi)``.

    Returns facts ⋈ ranges rows (all columns from both sides). ``how``
    must be 'inner' (range semantics with outer sides need explicit
    null-extension the caller should own). Degenerate ranges
    (hi ≤ lo) match nothing and are dropped before the explode."""
    if how != "inner":
        raise ValueError("binned_range_join supports inner joins only")
    taken = set(facts.columns) | set(ranges.columns)
    if "_bin" in taken:
        raise ValueError(
            "inputs already carry a '_bin' column — rename it; the join "
            "key would silently shadow and then drop it"
        )
    w = float(bin_width)
    fact_b = facts.withColumn("_bin", F.floor(F.col(value_col) / w))
    # last covered bin: ceil(hi/w) - 1 handles both boundary-aligned and
    # interior hi (hi is exclusive)
    range_b = (
        ranges.filter(F.col(hi_col) > F.col(lo_col))
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_col) / w),
                    F.ceil(F.col(hi_col) / w) - 1,
                )
            ),
        )
    )
    out = fact_b.join(range_b, "_bin").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )
    return out.drop("_bin")
