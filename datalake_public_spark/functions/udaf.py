"""Arrow-native UDAFs (grouped-aggregate pandas UDFs).

The reference has no UDAF surface at all (SURVEY §2.7 absence list — no
UDF/pandas_udf/UDAF/UDTF anywhere; closest is the built-in generator at
``dags/lib/k_means_with_spark.py:119-121``). This module adds the one
Spark idiom the built-in function library cannot cover: per-group
aggregates whose math needs the whole group in memory (rank statistics).

Implementation notes
--------------------
* ``PandasUDFType.GROUPED_AGG`` — each group's column arrives as ONE
  Arrow batch → pandas Series; the return scalar goes back JVM-side.
  This is the Arrow UDAF path: no per-row Python, one FFI per group.
* pd/np are imported at module level — under ``from __future__ import
  annotations`` pandas_udf resolves type hints at decoration time and
  fails with [UNSUPPORTED_SIGNATURE] if they are function-local.
* ``np.median`` bit-matches DuckDB ``median``/``mad`` (both compute the
  midpoint of the two central elements for even n — verified exact over
  the testdata). Quantile *interpolation* does NOT bit-match
  (``a+(b-a)*f`` vs DuckDB's form differs in the last ulp), so no IQR
  here — rank stats only.

Scale: a grouped-agg pandas UDF materializes each group on one executor
— fine for bounded groups (per-nation, per-day). For groups that can
reach millions of rows at 100 TB, prefer ``approx_percentile`` (sketch,
mergeable map-side) and treat this as the exact-math escape hatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median (midpoint-interpolated for even n), whole-group Arrow batch."""
    return float(np.median(v.to_numpy()))


@pandas_udf("double")
def mad_udaf(v: pd.Series) -> float:
    """Median absolute deviation: median(|x - median(x)|) — robust spread."""
    x = v.to_numpy()
    return float(np.median(np.abs(x - np.median(x))))


@pandas_udf("long")
def count_udaf(v: pd.Series) -> int:
    """Group size. Spark disallows mixing grouped-agg pandas UDFs with
    built-in aggregates in one agg() ([INVALID_PANDAS_UDF_PLACEMENT]),
    so counting alongside the rank stats needs its own UDAF."""
    return len(v)
