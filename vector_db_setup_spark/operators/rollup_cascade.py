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


_UNIT_SECONDS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


def _window_seconds(window: str) -> int | None:
    """Parse a Spark interval string ('1 hour', '90 minutes',
    '1 day 6 hours') to seconds; None for forms this parser doesn't
    know (sub-second, months — the caller then skips the alignment
    check rather than guessing)."""
    total = 0
    toks = window.strip().lower().split()
    if len(toks) % 2:
        return None
    for n, unit in zip(toks[::2], toks[1::2]):
        unit = unit.rstrip("s")
        if unit not in _UNIT_SECONDS or not n.isdigit():
            return None
        total += int(n) * _UNIT_SECONDS[unit]
    return total or None


def cascade(
    finer: DataFrame,
    window: str,
    bucket_col: str = "bucket",
    finer_window: str | None = None,
) -> DataFrame:
    """Next-coarser level from a finer rollup's partials: re-bucket the
    finer bucket timestamps and re-sum counts/sums. Never touches raw
    data.

    CORRECT ONLY when the coarser window is an integer multiple of the
    finer one: each finer bucket is attributed to the coarser window
    containing its START, so a misaligned cascade (hourly → '90
    minutes') silently books a straddling bucket's whole count to one
    side (r13 review pass). Pass ``finer_window`` (the string the finer
    level was built with) to have that checked up front; omitted, the
    caller owns the alignment invariant."""
    if finer_window is not None:
        fine_s, coarse_s = _window_seconds(finer_window), _window_seconds(window)
        if fine_s and coarse_s and coarse_s % fine_s != 0:
            raise ValueError(
                f"cascade window {window!r} is not an integer multiple "
                f"of the finer level's {finer_window!r} — a finer "
                "bucket would straddle two coarser windows and its "
                "whole count would silently land on one side"
            )
    return (
        finer.groupBy(F.window(bucket_col, window).alias("w"), "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "sum_value")
    )
