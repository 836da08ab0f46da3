"""Delimited-text source/sink (SURVEY.md §2.1 source surface).

The reference ingests only JSONL + a Postgres dump (setup.sh:73-77);
CSV rounds out the source formats a migrating user actually has on
disk. Spark-first: explicit schema (never inferSchema at scale — that's
a full extra pass over 100 TB), PERMISSIVE mode with a captured
corrupt-record column so one bad row quarantines instead of failing the
job, and a `.limit(n)` that Catalyst pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
    limit: int | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """CSV with an explicit schema.

    keep_corrupt=True appends a ``_corrupt_record`` string column holding
    the raw line for rows that fail to parse (PERMISSIVE mode) — the
    quarantine pattern: filtering on that column routes bad rows to a
    dead-letter sink while the clean rows proceed.
    """
    read_schema = schema
    if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
        read_schema = StructType(
            schema.fields + [StructField(CORRUPT_COL, StringType())]
        )
    df = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(read_schema)
        .csv(path)
    )
    return df.limit(limit) if limit is not None else df


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    mode: str = "overwrite",
    delimiter: str = ",",
) -> None:
    """Distributed CSV sink (one file per partition). ``delimiter``
    mirrors read_csv's — a round-trip through a non-comma dialect used
    to write commas regardless (r13 review pass)."""
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )
