"""Engine-portable exact arithmetic helpers.

The cross-engine rounding rule (NOTES_r1, extended in round 2): Spark's
``round(x, d)`` rounds the double's shortest-decimal repr half-up, DuckDB
rounds the binary double — so any ratio of SMALL integers that lands
exactly on a non-representable ``.…5`` boundary diverges between engines
(observed: quality 0.72125 → 0.7213 vs 0.7212). Ratios with large, prime-
factor-rich denominators can't terminate on the boundary and are safe;
per-document ratios (token counts, shingle counts — denominators 1..1e4)
are the hazard class.

``int_ratio_half_up`` computes floor(numer/denom · 10^d + ½) in pure
integer arithmetic — bit-identical everywhere — and divides by 10^d at
the end (exact-multiple division, exact in doubles). ``*_sql`` builds the
DuckDB twin; every use pairs them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def int_ratio_half_up(numer: Column, denom: Column, digits: int = 6) -> Column:
    """numer/denom rounded half-up to ``digits`` decimals via integer
    math. NULL when denom == 0 (wrap in ``F.coalesce(…, F.lit(0.0))``
    for a zero default). Inputs must be integral columns.

    Range limit: Spark evaluates the final ``(a - a%b)/b`` as DOUBLE
    division, so the intermediate ``a = 2·10^d·numer + denom`` must stay
    under 2^53 (not 2^63) for exactness — numerators up to ~4.5e8 at
    digits=6, ~4.5e10 at digits=4. Fine for per-document statistics
    (this helper's hazard class is SMALL-denominator ratios); for
    corpus-level totals beyond 2^53/2·10^d, compute the quotient in SQL
    (``a DIV b``) or pre-reduce the fraction instead."""
    scale = 10**digits
    a = F.lit(2 * scale) * numer.cast("long") + denom.cast("long")
    b = F.lit(2) * denom.cast("long")
    # (a - a % b) / b == a DIV b exactly; the double divisions are exact
    # (multiple-of-b numerator, then /10^d of an integer < 2^53)
    return F.when(denom > F.lit(0), (a - a % b) / b / F.lit(float(scale)))


def int_ratio_half_up_sql(numer: str, denom: str, digits: int = 6) -> str:
    """DuckDB twin of ``int_ratio_half_up`` (NULL when denom == 0).
    ``numer``/``denom`` are SQL expressions of BIGINT type."""
    scale = 10**digits
    return (
        f"CASE WHEN ({denom}) > 0 THEN "
        f"((2 * {scale} * CAST({numer} AS BIGINT) + CAST({denom} AS BIGINT)) "
        f"// (2 * CAST({denom} AS BIGINT))) / {scale}.0 END"
    )
