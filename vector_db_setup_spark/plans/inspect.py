"""Physical-plan inspection helpers.

The scale claims in this repo (shuffle-free top-k, broadcast dims,
pruned partition reads) are asserted, not assumed: tests call these
helpers on the executed plan. At 100 TB a wrong plan shape is the
difference between minutes and days, so plan regressions fail CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def n_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded)."""
    return len(re.findall(r"Exchange (hash|range)partitioning", executed_plan(df)))


def has_take_ordered(df: DataFrame) -> bool:
    """True when top-k compiles to TakeOrderedAndProject (per-partition
    heaps + driver merge) rather than a global sort."""
    return "TakeOrderedAndProject" in executed_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_partition_filter(df: DataFrame, col: str) -> bool:
    """True when a filter on a partition column reaches the scan as a
    PartitionFilter (pruned read)."""
    return f"PartitionFilters: [isnotnull({col}" in executed_plan(df)


def scan_pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries on parquet scans — predicate pushdown proof."""
    plan = executed_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
