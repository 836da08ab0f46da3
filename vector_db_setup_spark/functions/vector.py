"""Vector distance/similarity column expressions.

The reference's single vector operator is pgvector's L2 ``<->``
(fever_multi_agent.py:71, test_connection.py:93), evaluated per row in C
inside Postgres. Here each metric is a *native* Spark column expression
(``zip_with`` + ``aggregate``): it stays inside whole-stage codegen, needs
no Python round trip, and Catalyst can pipeline it with the surrounding
scan/filter/top-k. That keeps the flagship KNN completely JVM-side.

All math is done in double precision regardless of the stored element
type (fixtures store float32) so results are reproducible against the
DuckDB oracle (`list_distance` on DOUBLE[]).

At 100 TB: these expressions scale linearly with rows × dim and never
shuffle. For very wide vectors (≥ 1k dims) an Arrow pandas_udf with numpy
can win on constant factors — `pandas_l2_udf` below is that escape hatch;
benchmarks at 64-d and 768-d showed the native expression within budget,
so it is the default.
"""

from __future__ import annotations

import math

import numpy as np  # module scope: pandas_udf type-hint resolution
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def vector_literal(vec) -> Column:
    """Python list → array<double> literal column.

    Replaces the reference's client-side pgvector adapter
    (``register_vector`` + ``%s::vector`` cast, fever_multi_agent.py:33,71).

    Built as ONE parsed SQL expression: the element-wise
    ``F.array(*[F.lit(x) ...])`` form costs one py4j round trip per
    element (~60 ms for a 64-dim vector, ~1.2 s for a 20-vector
    benchmark literal — measured dominating the per-invocation wall of
    every literal-vector query), while a single ``F.expr`` parse yields
    the IDENTICAL analyzed tree (array of double literals + cast) for
    one round trip. Non-finite elements (inf/nan have no plain SQL
    literal form) fall back to the per-element builder.
    """
    vals = [float(x) for x in vec]
    if vals and all(math.isfinite(x) for x in vals):
        return F.expr(
            "array(" + ",".join(repr(x) + "D" for x in vals) + ")"
        ).cast("array<double>")
    return F.array(*[F.lit(x) for x in vals]).cast("array<double>")


def l2_distance_sq(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance — same ordering as L2, one sqrt cheaper.

    Use for top-k ranking where only the order matters.
    """
    a, b = _as_double(a), _as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Exact Euclidean distance — pgvector ``<->`` semantics
    (reference: fever_multi_agent.py:71)."""
    return F.sqrt(l2_distance_sq(a, b))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Inner product — pgvector ``<#>`` is the negated form."""
    a, b = _as_double(a), _as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a·b / (|a||b|). NULL-safe on zero vectors (returns NULL
    rather than dividing by zero, matching SQL division semantics)."""
    a, b = _as_double(a), _as_double(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    """pgvector ``<=>`` semantics: 1 - cosine similarity."""
    return F.lit(1.0) - cosine_similarity(a, b)


def random_vector(dim: int, seed: int = 42) -> Column:
    """ONE deterministic pseudo-random query vector as a literal
    (reference: test_connection.py:86 draws a single np.random.rand(768)
    and ranks all rows against it).

    Drawn driver-side with a seeded numpy RNG and shipped as a literal
    array — the previous per-row ``F.rand`` form drew a DIFFERENT
    vector for every row (F.rand is per-row and per-partition-seeded),
    which made "nearest to the random query" meaningless and
    partitioning-dependent.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    return vector_literal(rng.random(dim).tolist())


def pandas_l2_udf():
    """Arrow-vectorized L2 fallback for very wide vectors.

    Returns a pandas_udf computing per-row L2 distance between two
    array columns via numpy. ~10-100× faster than row-at-a-time Python
    UDFs (Arrow batch transfer), but still loses to the native expression
    at 64-d; kept for the 768-d reference-shaped path and beyond.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _l2(a: pd.Series, b: pd.Series) -> pd.Series:
        # null-safe like knn._pandas_l2_to_query: a NULL or
        # width-mismatched vector must yield a null distance, not kill
        # the whole Arrow batch in np.stack
        av, bv = a.to_numpy(), b.to_numpy()
        out = np.full(len(av), np.nan)
        ok = [
            i
            for i in range(len(av))
            if av[i] is not None
            and bv[i] is not None
            and len(av[i]) == len(bv[i])
        ]
        if ok:
            am = np.stack([np.asarray(av[i], dtype=np.float64) for i in ok])
            bm = np.stack([np.asarray(bv[i], dtype=np.float64) for i in ok])
            out[ok] = np.sqrt(((am - bm) ** 2).sum(axis=1))
        s = pd.Series(out)
        return s.where(~np.isnan(out), None)

    return _l2


def assert_dim(df, vec_col: str, dim: int) -> None:
    """Enforce fixed vector dimensionality by assertion (SURVEY.md §7:
    Spark has no fixed-size array type — the check constraint lives at
    ingest/validation time, not in the type system). One aggregate scan;
    raises ValueError naming the offending cardinalities."""
    bad = (
        df.select(F.size(F.col(vec_col)).alias("d"))
        .filter(F.col("d") != dim)
        .groupBy("d")
        .count()
        .collect()
    )
    if bad:
        detail = ", ".join(f"dim {r['d']}: {r['count']} rows" for r in bad)
        raise ValueError(
            f"column {vec_col!r} must be {dim}-dimensional; found {detail}"
        )
