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


# ---------------------------------------------------------------------------
# Real-model adapter seam (reference fever_multi_agent.py:49-56 loads a
# SentenceTransformer once at module import and encodes claim text
# in-process; the Spark restatement loads the model once PER EXECUTOR
# PROCESS and batch-encodes per Arrow batch).
# ---------------------------------------------------------------------------

# per-worker-process model cache: mapInPandas workers are long-lived
# Python processes, so the loader runs once per executor, not per batch
_MODEL_CACHE: dict[str, object] = {}


def _get_or_load(key: str, loader):
    """Per-process lazy singleton: the heavyweight model load happens at
    most once per (executor process, key)."""
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = loader()
    return _MODEL_CACHE[key]


def embed_with_model(
    df,
    model_loader,
    text_col: str = "text",
    out_col: str = "embedding",
    batch_rows: int | None = None,
    cache_key: str | None = None,
):
    """Attach ``out_col: array<double>`` by batch-encoding ``text_col``
    through a user-supplied model.

    ``model_loader`` is a zero-arg picklable callable returning an object
    with ``encode(list[str]) -> (n, dim) array-like`` (the
    sentence-transformers surface). It ships to executors by pickle;
    the heavy load runs lazily, once per executor process (module-level
    cache) — NOT per batch and NOT on the driver. Arrow moves only
    strings in / float arrays out.

    The cache key, in priority order: explicit ``cache_key`` argument, a
    ``cache_key`` attribute on the loader (``sentence_transformer_loader``
    sets one per model name), else the pickled loader bytes. The loader's
    qualified name is deliberately NOT used — distinct closures from one
    factory share a qualname, which would silently alias different models
    loaded in the same executor process.

    This is the production seam behind the deterministic
    ``hash_embed_expr/udf`` stand-ins: same DataFrame contract, so
    downstream KNN/dedup plans are unchanged whichever embedder runs.
    """
    import numpy as np
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    key = cache_key or getattr(model_loader, "cache_key", None)
    if key is None:
        try:  # closures need cloudpickle (what Spark ships UDFs with)
            from pyspark import cloudpickle

            key = "pickle:" + cloudpickle.dumps(model_loader).hex()
        except Exception:
            key = f"id:{id(model_loader)}"
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def _gen(batches):
        model = _get_or_load(key, model_loader)
        for pdf in batches:
            texts = pdf[text_col].astype(str).tolist()
            if batch_rows:
                chunks = [
                    texts[i : i + batch_rows]
                    for i in range(0, len(texts), batch_rows)
                ]
            else:
                chunks = [texts] if texts else []
            vecs = [
                np.asarray(model.encode(c), dtype=np.float64) for c in chunks
            ]
            mat = np.concatenate(vecs) if vecs else np.zeros((0, 0))
            out = pdf.copy()
            out[out_col] = [row.tolist() for row in mat]
            yield out

    return df.mapInPandas(_gen, schema=out_schema)


def sentence_transformer_loader(model_name: str = "all-MiniLM-L6-v2"):
    """Loader factory for the reference's embedder
    (fever_multi_agent.py:49-56). Returns a zero-arg callable for
    ``embed_with_model``; raises ImportError at call time if
    sentence-transformers/torch aren't installed (they are not in this
    container — inject a fake model with the same ``encode`` surface to
    exercise the seam, as tests/test_embed_adapter.py does)."""

    def _load():
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "sentence-transformers is not installed in this "
                "environment; embed_with_model accepts any loader whose "
                "model exposes encode(list[str]) -> (n, dim) array"
            ) from e
        return SentenceTransformer(model_name)

    # distinct per model name: without this, every closure from this
    # factory shares the same __qualname__ and two models loaded in one
    # executor process would alias each other in _MODEL_CACHE
    _load.cache_key = f"sentence-transformer:{model_name}"
    return _load


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
