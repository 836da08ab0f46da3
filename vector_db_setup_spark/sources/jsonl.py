"""JSONL claims source + JSON results sink (SURVEY.md §2.1 S4/S5).

Reference semantics:
- source: read claims line-by-line with a row limit, fields id/claim/label
  with missing→None (`data.get`, fever_multi_agent.py:260-273);
- sink: one pretty-printed UTF-8 JSON array of nested result records
  (`json.dump(..., ensure_ascii=False, indent=2)`, :342-345).

Spark-first: an explicit schema (missing fields become null — exactly the
`.get` behavior), `.limit(n)` pushed into the scan by Catalyst, and
`df.write.json` for distributed output. The single-file pretty writer is
kept only for reference-shaped golden files (driver-side by design).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

CLAIMS_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("claim", StringType()),
        StructField("label", StringType()),
    ]
)


def read_claims(
    spark: SparkSession, path: str, limit: int | None = None
) -> DataFrame:
    """JSONL claims with explicit schema and optional row limit
    (reference: load_claims_from_jsonl, limit default 5)."""
    df = spark.read.json(path, schema=CLAIMS_SCHEMA)
    return df.limit(limit) if limit is not None else df


def write_results_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed JSON sink (one object per line, partitioned files)."""
    df.write.mode(mode).json(path)


def write_results_single_file(df: DataFrame, path: str) -> None:
    """Reference-shaped golden file: ONE pretty-printed JSON array, UTF-8
    (fever_multi_agent.py:342-345). Collects — only for small result
    sets (eval summaries), never a data path."""
    records = [row.asDict(recursive=True) for row in df.collect()]
    with open(path, "w", encoding="utf-8") as f:
        json.dump(records, f, ensure_ascii=False, indent=2)
