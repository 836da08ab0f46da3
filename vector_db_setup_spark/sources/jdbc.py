"""JDBC interop — the migration path off the reference's live Postgres.

The reference's storage layer IS a Postgres database (setup.sh:73-77
restores a pg_dump; every query in fever_multi_agent.py runs over
psycopg2). A user switching to this engine with data still in Postgres
reads it through Spark's JDBC source and lands it as partitioned
parquet (``sources/ingest.py``) once; this module wraps the read with
the two things that matter at scale:

- **partitioned pulls**: ``partition_column``/``lower_bound``/
  ``upper_bound``/``num_partitions`` make N executors issue N
  range-disjoint queries instead of one single-threaded full-table
  cursor — the difference between hours and minutes on a big table;
- **predicate pushdown**: Catalyst pushes filters into the remote SQL
  (visible as ``PushedFilters`` in the scan node), so a filtered
  migration reads only matching rows over the wire.

Tested against an embedded Derby database (the one JDBC engine on
Spark's default classpath) — a real end-to-end JDBC round trip, plus a
reader-contract test for the exact option set sent to a production
driver (tests/test_jdbc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_table_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    options: dict[str, str] | None = None,
    reader=None,
) -> DataFrame:
    """Read one table (or ``"(subquery) alias"``) over JDBC.

    For a partitioned read pass ALL of ``partition_column`` /
    ``lower_bound`` / ``upper_bound`` / ``num_partitions`` (Spark's
    contract: the column must be numeric, date, or timestamp; rows
    outside the bounds are still read, by the two unbounded edge
    queries). Passing only some of the four raises here rather than
    silently falling back to a single-cursor read.

    ``fetch_size`` tunes the remote cursor's batch (default vendor
    fetch sizes — e.g. Postgres's fetch-all — stall large pulls).
    ``reader`` injects a ``DataFrameReader``-compatible object for
    contract tests; defaults to ``spark.read``.
    """
    part_args = (partition_column, lower_bound, upper_bound, num_partitions)
    n_set = sum(a is not None for a in part_args)
    if n_set not in (0, 4):
        raise ValueError(
            "partitioned JDBC read needs ALL of partition_column, "
            f"lower_bound, upper_bound, num_partitions (got {n_set}/4)"
        )
    r = (reader if reader is not None else spark.read).format("jdbc")
    r = r.option("url", url).option("dbtable", table)
    r = r.option("fetchsize", str(fetch_size))
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    if driver is not None:
        r = r.option("driver", driver)
    if user is not None:
        r = r.option("user", user)
    if password is not None:
        r = r.option("password", password)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load()


def write_table_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame back over JDBC — the REVERSE migration (e.g.
    publishing curated results into the Postgres the reference's other
    consumers still read).

    Each Spark partition opens one connection and inserts in
    ``batch_size``-row JDBC batches; ``num_partitions`` caps the
    connection fan-in via the writer's own option (Spark coalesces
    before writing when the frame has more partitions) — a 1000-task
    write would otherwise open 1000 simultaneous connections against
    one database. ``mode`` follows DataFrameWriter semantics; the
    default ``append`` never drops the remote table, ``overwrite``
    does (Spark issues DROP/CREATE unless ``truncate`` is passed via
    ``options``).
    """
    w = df.write.format("jdbc").mode(mode)
    w = w.option("url", url).option("dbtable", table)
    w = w.option("batchsize", str(batch_size))
    if num_partitions is not None:
        w = w.option("numPartitions", str(num_partitions))
    if driver is not None:
        w = w.option("driver", driver)
    if user is not None:
        w = w.option("user", user)
    if password is not None:
        w = w.option("password", password)
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.save()


def ingest_jdbc_to_parquet(
    spark: SparkSession,
    url: str,
    table: str,
    out_path: str,
    *,
    partition_by: str | None = None,
    **jdbc_kwargs,
) -> None:
    """One-shot migration: partitioned JDBC pull -> partitioned parquet.
    After this, every query runs on the columnar copy (predicate/column
    pruning, no remote database in the hot path) — the intended
    steady-state for a user leaving the reference's Postgres."""
    df = load_table_jdbc(spark, url, table, **jdbc_kwargs)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(out_path)
