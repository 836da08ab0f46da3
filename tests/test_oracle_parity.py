"""Local replica of the driver's correctness gate: run every declared
query on Spark at sf0.01 and its oracle SQL on DuckDB over the same
parquet, then compare row count, column names, and values
order-insensitively (floats to 1e-6 after the queries' own rounding).
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_ORACLE
from vector_db_setup_spark import queries as q


def _canon(rows, columns):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [columns[i] for i in idx], out


ORACLE_NAMES = sorted(q.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    sdf = q.queries()[name](spark, SF_ORACLE)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    # Driver-fetch-path guard (r4 context_packing post-mortem): the
    # external driver fetches DuckDB results via pandas/Arrow, where an
    # uncast sum(BIGINT) surfaces as HUGEINT -> decimal128/float64 and
    # hash-diverges from Spark's int64 even when fetchall() values (the
    # comparison below) are identical Python ints. Assert no oracle
    # leaks HUGEINT/DECIMAL into its final projection.
    arrow_schema = duck.execute(q.oracle_sql()[name]).arrow().schema
    leaky = [
        f.name
        for f in arrow_schema
        if str(f.type).startswith("decimal")
    ]
    assert not leaky, (
        f"{name}: oracle columns {leaky} are DuckDB HUGEINT/DECIMAL — "
        "cast to BIGINT/DOUBLE in the oracle SQL or the driver's "
        "pandas fetch will hash-diverge from Spark"
    )

    s_cols, s_canon = _canon(spark_rows, spark_cols)
    d_cols, d_canon = _canon(duck_rows, duck_cols)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_canon) == len(d_canon), (
        f"{name}: row count {len(s_canon)} vs {len(d_canon)}"
    )
    mism = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[0]}"


def test_all_queries_have_entries():
    # every oracle key must have a query (driver requirement)
    assert set(q.oracle_sql()) <= set(q.queries())
