"""Grouped custom aggregation via applyInPandas (SURVEY.md §2.11 UDAF
surface).

The reference has no UDAF; this is the Spark-idiomatic escape hatch for
aggregates the built-in function library lacks. Median absolute
deviation (MAD) is the worked example: Spark has no ``mad`` built-in
(DuckDB does — the oracle uses it), and exact medians don't decompose
into partial aggregates, so a shuffle-on-key + per-group pandas kernel
is the honest formulation. At 100 TB the per-group state is one numpy
array per key per task — safe while each group fits in executor memory
(true for per-language groups; for high-cardinality keys switch to
approx_percentile, which IS decomposable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def grouped_mad(
    df: DataFrame, key_col: str, val_col: str, out_col: str = "mad", ndigits: int = 2
) -> DataFrame:
    """Exact per-group median absolute deviation: median(|x - median(x)|).

    NULL values are IGNORED (SQL aggregate semantics — DuckDB's `mad`,
    the documented oracle, does the same); a group whose values are all
    NULL yields NULL. The r13 review pass found the previous form fed
    NaNs into np.median, turning one NULL into a NULL result for the
    whole group where the oracle returns the non-null rows' MAD."""
    if out_col == key_col:
        raise ValueError(
            f"grouped_mad out_col {out_col!r} collides with the key"
        )

    def _mad(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[val_col].to_numpy(dtype=np.float64)
        x = x[~np.isnan(x)]  # NULLs arrive as NaN
        if len(x) == 0:
            mad = None
        else:
            med = float(np.median(x))
            mad = round(float(np.median(np.abs(x - med))), ndigits)
        return pd.DataFrame({key_col: [pdf[key_col].iloc[0]], out_col: [mad]})

    key_type = df.schema[key_col].dataType.simpleString()
    schema = f"{key_col} {key_type}, {out_col} double"
    return df.select(key_col, val_col).groupBy(key_col).applyInPandas(_mad, schema)
