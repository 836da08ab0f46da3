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
    """Exact per-group median absolute deviation: median(|x - median(x)|)."""

    def _mad(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[val_col].to_numpy(dtype=np.float64)
        med = float(np.median(x))
        mad = float(np.median(np.abs(x - med)))
        return pd.DataFrame({key_col: [pdf[key_col].iloc[0]], out_col: [round(mad, ndigits)]})

    key_type = df.schema[key_col].dataType.simpleString()
    schema = f"{key_col} {key_type}, {out_col} double"
    return df.select(key_col, val_col).groupBy(key_col).applyInPandas(_mad, schema)
