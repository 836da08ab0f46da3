"""Python user-defined table functions (Spark 4 UDTF API).

The reference has no UDTF surface (SURVEY.md §2.11); this exercises the
PySpark 4 ``@udtf`` + SQL ``LATERAL`` call path — the table-function
analogue of the reference's per-row fan-outs. Python UDTFs run
row-at-a-time on the Python side: correct but the slow path. For bulk
shingling the engine's hot path is the codegen'd posexplode pipeline in
operators/dedup.py; this UDTF exists for API completeness and for
fan-outs whose logic genuinely needs imperative Python.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, shingle: string")
class CharShingles:
    """Emit every n-char shingle of ``text`` with its 1-based position."""

    def eval(self, text: str, n: int):
        if text is None or n is None or n <= 0:
            return
        for i in range(len(text) - n + 1):
            yield i + 1, text[i : i + n]


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("char_shingles", CharShingles)
