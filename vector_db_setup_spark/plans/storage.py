"""Storage layout for scale: partitioned + bucketed writes.

The reference's storage is a restored Postgres heap (setup.sh:73-77) —
no layout control at all. At 100 TB, layout IS the query plan:

- **Partitioning** (directory-level): coarse pruning on low-cardinality
  predicates (date, cluster_id). A partition filter means unread bytes.
- **Bucketing** (file-level hash layout): pre-shuffled storage. Two
  tables bucketed on the same key with the same bucket count join with
  ZERO shuffle — the sort-merge join reads co-located buckets. For the
  lineitem⋈orders fact-fact join this converts the biggest shuffle in
  the workload into a pure scan.

Bucketed tables must go through the catalog (`saveAsTable`) — bucket
metadata lives in the metastore, not the parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet: predicates on partition_cols become
    PartitionFilters (pruned IO)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (optionally sorted) catalog table. Joins/aggs keyed
    on bucket_col over tables with matching bucketing skip the exchange
    (and with sort_col, the sort) entirely."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key —
    shuffle-free by construction (verified in tests/test_storage.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)
