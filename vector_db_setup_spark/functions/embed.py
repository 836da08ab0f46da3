"""Embedding generation (SURVEY.md §2.9 V3/V4, §2.11 U1).

The reference embeds text in-process with a globally-loaded
SentenceTransformer (fever_multi_agent.py:49-56) and has a dormant
OpenAI HTTP path (:37-46). Spark-first restatement:

- `hash_embed_expr`: a deterministic md5-derived embedding as a NATIVE
  column expression — the oracle-checkable stand-in used by correctness
  runs (no model, no network, bit-identical in DuckDB).
- `hash_embed_udf`: the same values through an Arrow pandas_udf — the
  seam where a real model goes. A production sentence-transformer
  adapter replaces the numpy body with a per-executor lazy model
  singleton (load once per worker, batch-encode per Arrow batch);
  the DataFrame-level contract (string col in, array<double> out) is
  already exactly right.

Parity: expr and udf produce identical vectors (tested), so swapping
implementation never changes downstream KNN results.
"""

from __future__ import annotations

import pandas as pd  # module-scope: pandas_udf type-hint resolution needs it
from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_DIM = 8


def hash_embed_expr(text: Column | str, dim: int = DEFAULT_DIM) -> Column:
    """Deterministic embedding: component i is a [0,1) value from 4 hex
    chars of md5(i || '|' || text). Native expression (conv/substring) —
    whole-stage codegen, no Python."""
    c = F.col(text) if isinstance(text, str) else text
    comps = []
    for i in range(dim):
        h = F.md5(F.encode(F.concat_ws("|", F.lit(str(i)), c), "UTF-8"))
        comps.append(
            F.conv(F.substring(h, 1, 4), 16, 10).cast("double") / F.lit(65536.0)
        )
    return F.array(*comps)


def hash_embed_udf(dim: int = DEFAULT_DIM):
    """Arrow-batched pandas UDF computing the same embedding.

    Structure mirrors a real model adapter: per-batch vectorized work,
    lazy heavyweight init outside the loop (here: none needed).
    """
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _embed(texts: pd.Series) -> pd.Series:
        def one(t: str) -> list[float]:
            return [
                int(hashlib.md5(f"{i}|{t}".encode()).hexdigest()[:4], 16) / 65536.0
                for i in range(dim)
            ]

        return texts.map(one)

    return _embed
