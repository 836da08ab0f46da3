"""pgvector's SQL surface on Spark: SQL scalar functions for vector math.

The reference's users query THROUGH SQL — pgvector exposes `<->`
(L2), `<=>` (cosine distance), `<#>` (negative inner product) and
functions like vector_dims/vector_norm, and fever_multi_agent.py's
retrieval is an ORDER BY embedding <-> %s LIMIT k (fever_multi_agent.py:64-76).
The DataFrame twins live in functions/vector.py; this module gives a
SQL user the same vocabulary via Spark 4 SQL scalar UDFs
(CREATE FUNCTION ... RETURN <expression>, SPARK-28264).

Why SQL UDFs and not spark.udf.register: a SQL UDF body is a pure
Catalyst expression INLINED at resolution time — it whole-stage-
codegens, constant-folds, and pushes down exactly like the hand-built
Column expression, with zero Python in the execution path. A
registered Python UDF would put every distance evaluation through
serialization.

Each body is self-contained (no UDF-calls-UDF) so resolution order
never matters.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DOT = (
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
)

_FUNCS: dict[str, str] = {
    # pgvector `<->`
    "l2_distance": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (acc, v) -> acc + v))"
    ),
    # pgvector `<#>` returns the NEGATIVE inner product (index ordering
    # trick); expose both the plain dot and the pgvector-compatible form
    "inner_product": f"(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN {_DOT}",
    "negative_inner_product": (
        f"(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN -({_DOT})"
    ),
    # pgvector `<=>` = 1 - cosine similarity. nullif on the norm
    # product: a zero vector yields NULL, matching the DataFrame twin
    # (functions/vector.py cosine_similarity) — without it ANSI mode
    # raises DIVIDE_BY_ZERO, so ONE zero vector in the corpus would
    # crash every SQL cosine query (r13 review pass)
    "cosine_distance": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        f"1.0D - {_DOT} / nullif("
        "sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)) * "
        "sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)), 0.0D)"
    ),
    "vector_dims": "(a ARRAY<DOUBLE>) RETURNS INT RETURN size(a)",
    "vector_norm": (
        "(a ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v))"
    ),
}


def register_sql_vector_functions(spark: SparkSession) -> list[str]:
    """Create the temporary SQL functions on this session (idempotent —
    OR REPLACE). Returns the registered names."""
    for name, body in _FUNCS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return list(_FUNCS)
