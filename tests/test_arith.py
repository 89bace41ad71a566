"""functions/arith: exact integer half-up rounding, Spark ≡ DuckDB ≡
decimal half-up — including the .xxxx5 boundaries that float round()
gets wrong across engines."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

from datalake_public_spark.functions.arith import (
    int_ratio_half_up,
    int_ratio_half_up_sql,
)

# (numer, denom) — includes exact 4dp boundaries (577/800 = 0.72125, the
# observed production mismatch; 1/32 = 0.03125), a 6dp boundary
# (1/160000), and ordinary ratios
CASES = [(577, 800), (1, 32), (21, 40), (1, 3), (2, 3), (167, 206), (1, 160000),
         (7, 7), (0, 5), (3, 0)]


@pytest.mark.parametrize("digits", [4, 6])
def test_spark_duckdb_decimal_agree(spark, digits):
    from pyspark.sql import functions as F

    rows = spark.createDataFrame(CASES, "n long, d long")
    got = {
        (r.n, r.d): r.r
        for r in rows.select(
            "n", "d", int_ratio_half_up(F.col("n"), F.col("d"), digits).alias("r")
        ).collect()
    }
    con = duckdb.connect()
    for n, d in CASES:
        duck = con.execute(
            f"SELECT {int_ratio_half_up_sql(str(n), str(d), digits)}"
        ).fetchone()[0]
        if d == 0:
            assert got[(n, d)] is None and duck is None
            continue
        expected = float(
            (Decimal(n) / Decimal(d)).quantize(
                Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP
            )
        )
        assert got[(n, d)] == expected == duck, (n, d, got[(n, d)], duck, expected)
