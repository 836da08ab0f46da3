"""LLM map stages (SURVEY.md §2.11 U2-U4) — the mapInPandas seam.

The reference makes 5 sequential OpenAI HTTP calls per claim
(fever_multi_agent.py:235-247). Spark-first: an LLM stage is a batched
`mapInPandas` transform — rows in, rows + completion column out — so a
1M-claim run parallelizes across executors and batches within them.

The network is NOT exercised here (no external calls from the engine's
test path — by design): `respond_fn` defaults to the deterministic
stand-in used across the pipeline; a production adapter passes a
function that does batched HTTP against whatever endpoint, with retry/
rate-limit handled inside the batch loop. The pipeline shape, schema
handling, and batching are what this module owns and tests.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

LABELS = ("SUPPORTS", "REFUTES", "NOT ENOUGH INFO")


def det_respond(prompts: pd.Series) -> pd.Series:
    """Deterministic stand-in 'model': md5-keyed label (matches
    operators/pipeline._det_label semantics)."""
    return prompts.map(
        lambda p: LABELS[int(hashlib.md5(p.encode()).hexdigest()[0], 16) % 3]
    )


def llm_map_stage(
    df: DataFrame,
    prompt_template: str,
    input_cols: list[str],
    output_col: str = "completion",
    respond_fn: Callable[[pd.Series], pd.Series] | None = None,
    batch_size: int | None = None,
) -> DataFrame:
    """Append a completion column computed per Arrow batch.

    prompt_template is a str.format template over input_cols (the
    f-string prompts of fever_multi_agent.py:132-151 become data).
    respond_fn maps a Series of prompts to a Series of completions —
    deterministic by default; batched-HTTP in production.
    """
    respond = respond_fn or det_respond
    out_schema = StructType(
        list(df.schema.fields) + [StructField(output_col, StringType())]
    )

    def _stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            prompts = pdf.apply(
                lambda row: prompt_template.format(
                    **{c: row[c] for c in input_cols}
                ),
                axis=1,
            ) if len(pdf) else pd.Series([], dtype=str)
            pdf = pdf.copy()
            pdf[output_col] = respond(prompts) if len(pdf) else prompts
            yield pdf

    return df.mapInPandas(_stage, schema=out_schema)
