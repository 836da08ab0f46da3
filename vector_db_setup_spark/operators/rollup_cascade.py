"""Hypertable-style cascade rollups: coarse aggregates from fine ones.

The continuous-aggregate pattern: materialize the finest rollup once
(hourly), derive every coarser resolution (daily, monthly) from the
previous level's PARTIALS instead of rescanning raw events. At 100 TB
the raw table is petabytes but the hourly rollup is thousands of rows
per key — each cascade level costs a scan of the level above, not the
base table. Sums/counts re-aggregate losslessly; avg is derived as
sum/count at read time (never averaged-of-averages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_level(
    events: DataFrame, window: str, ts_col: str = "ts"
) -> DataFrame:
    """Finest-level rollup from raw events: per (window, event_type)
    partials (count + sum — the re-aggregable measures)."""
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "sum_value")
    )


def cascade(
    finer: DataFrame, window: str, bucket_col: str = "bucket"
) -> DataFrame:
    """Next-coarser level from a finer rollup's partials: re-bucket the
    finer bucket timestamps and re-sum counts/sums. Never touches raw
    data."""
    return (
        finer.groupBy(F.window(bucket_col, window).alias("w"), "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "sum_value")
    )
