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


def zorder_key(
    col_a, col_b, bits: int = 16
):
    """Morton (Z-order) key from two NON-NEGATIVE integer columns already
    scaled into [0, 2^bits): interleaves their bits so rows close in
    EITHER dimension land close in the sort order. Pure codegen
    expression (2·bits shift/mask terms), no UDF."""
    from pyspark.sql import functions as F

    # long arithmetic throughout: with int inputs, shiftleft at bit 31
    # wraps to -2^31 and corrupts the ordering for large second-key
    # values
    a = (col_a if not isinstance(col_a, str) else F.col(col_a)).cast("long")
    b = (col_b if not isinstance(col_b, str) else F.col(col_b)).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def scale_to_bits(col, lo, hi, bits: int = 16):
    """Affine-map a numeric column from [lo, hi] into [0, 2^bits) for
    zorder_key (rank-free normalization; exact bounds via min/max agg)."""
    from pyspark.sql import functions as F

    c = col if not isinstance(col, str) else F.col(col)
    import math

    if lo is None or hi is None or (
        isinstance(lo, float) and math.isnan(lo)
    ) or (isinstance(hi, float) and math.isnan(hi)):
        # empty input or NaN bounds: no meaningful scaling exists;
        # constant 0 keeps the write valid (and empty inputs write
        # an empty dataset instead of raising)
        return F.lit(0).cast("long")
    span = float(hi - lo) if hi > lo else 1.0
    # clamp BEFORE the cast: an out-of-range double -> long cast is a
    # runtime error under ANSI mode (Spark 4 default here)
    scaled = ((c - F.lit(lo)) / F.lit(span)) * F.lit(float((1 << bits) - 1))
    clamped = F.least(
        F.greatest(scaled, F.lit(0.0)), F.lit(float((1 << bits) - 1))
    )
    return F.coalesce(clamped.cast("long"), F.lit(0))


def write_zordered(
    df,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Z-order-clustered parquet: sort the data by the interleaved
    Morton key of (col_a, col_b) across `n_files` range partitions, so
    parquet footer min/max stats stay NARROW on BOTH columns — a point
    or range filter on either column prunes most files/row-groups at
    scan time. The multi-dimensional analogue of write_partitioned's
    directory pruning; this is how lakehouse tables cluster 100 TB for
    two-key workloads without 2-level directory explosions.

    Bounds for the bit-scaling come from one min/max aggregate (a single
    extra scan of the two columns, pushed down to parquet stats when
    possible)."""
    from pyspark.sql import functions as F

    bounds = df.agg(
        F.min(col_a).alias("a_lo"), F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"), F.max(col_b).alias("b_hi"),
    ).first()
    z = zorder_key(
        scale_to_bits(col_a, bounds["a_lo"], bounds["a_hi"], bits),
        scale_to_bits(col_b, bounds["b_lo"], bounds["b_hi"], bits),
        bits,
    )
    # fresh working name: a caller's __z column would be overwritten
    # and dropped from the written data (r13 review pass)
    zc = "__z"
    while zc in df.columns:
        zc += "_"
    (
        df.withColumn(zc, z)
        .repartitionByRange(n_files, zc)
        .sortWithinPartitions(zc)
        .drop(zc)
        .write.mode("overwrite")
        .parquet(path)
    )
