"""Scalar (int8) embedding quantization — the vector-compression path.

pgvector ships halfvec/quantization because at index scale the vector
bytes dominate IO; at 100 TB the same pressure says: store embeddings
as int8 codes (4x smaller than float32, 8x than float64) and rerank
the few candidates that matter at full precision. This module is that
scheme as pure DataFrame expressions:

  fit   : per-dimension [lo, hi] over the corpus — d min/max aggregate
          slots in ONE pass (codegen, no explode, no shuffle beyond
          the single-row aggregate)
  encode: code_i = round(255 * (x_i - lo_i) / (hi_i - lo_i)) clamped
          to [0, 255] — a transform() lambda over the array, JVM-side
  decode: x̂_i = lo_i + code_i * (hi_i - lo_i) / 255

The quantizer params travel as ARRAY columns on a one-row DataFrame
broadcast onto the corpus — no driver round-trip, so fit+encode
composes lazily into a single job.

Guarantee: reconstruction error per dimension is at most half a step,
(hi_i - lo_i) / 510 — asserted in tests and surfaced by the
`embedding_quantization_error` query (exact DuckDB oracle: the
arithmetic is deterministic IEEE double math on both engines).

KNN over codes: L2 on decoded vectors approximates true L2; rank by
it, keep a candidate margin, rerank exactly. `quantized_knn` wires
that shape; its recall against exact KNN is measured in tests (not
oracled — the approximation is the point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fit_scalar_quantizer",
    "quantize",
    "dequantize_expr",
    "attach_quantizer",
]


def fit_scalar_quantizer(
    emb: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """One-row DataFrame (lo ARRAY<DOUBLE>, hi ARRAY<DOUBLE>) of
    per-dimension corpus bounds. d min + d max aggregate slots in one
    scan — partial aggregation map-side, a single-row shuffle. `dim`
    defaults to the first row's length (one cheap lookup)."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    lo = [F.min(F.col(vec_col)[i].cast("double")) for i in range(dim)]
    hi = [F.max(F.col(vec_col)[i].cast("double")) for i in range(dim)]
    return emb.agg(
        F.array(*lo).alias("lo"), F.array(*hi).alias("hi")
    )


def attach_quantizer(df: DataFrame, quantizer: DataFrame) -> DataFrame:
    """Broadcast the one-row (lo, hi) onto every row — the params are
    columns, never driver values, so the whole pipeline stays lazy."""
    return df.crossJoin(F.broadcast(quantizer))


def quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Append int codes (ARRAY<INT> in [0,255]) for `vec_col`, using the
    attached lo/hi columns. Degenerate dims (hi == lo) encode as 0 and
    decode back to lo exactly."""
    return df.withColumn(
        out_col,
        F.expr(
            f"""
            transform(sequence(0, size({vec_col}) - 1), i ->
                CASE WHEN hi[i] = lo[i] THEN 0
                     ELSE least(255, greatest(0,
                          CAST(round(255.0D * (CAST({vec_col}[i] AS DOUBLE) - lo[i])
                                     / (hi[i] - lo[i])) AS INT)))
                END)
            """
        ),
    )


def dequantize_expr(codes_col: str = "codes"):
    """Column expression: decoded ARRAY<DOUBLE> from codes + lo/hi."""
    return F.expr(
        f"""
        transform(sequence(0, size({codes_col}) - 1), i ->
            lo[i] + CAST({codes_col}[i] AS DOUBLE) * (hi[i] - lo[i]) / 255.0D)
        """
    )
