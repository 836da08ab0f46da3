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
import json
import time
import urllib.error
import urllib.request
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


def http_respond_fn(
    url: str,
    *,
    batch_size: int = 32,
    max_retries: int = 3,
    timeout: float = 30.0,
    backoff: float = 0.1,
    headers: dict[str, str] | None = None,
) -> Callable[[pd.Series], pd.Series]:
    """Build a production ``respond_fn``: batched HTTP POST to an
    inference endpoint (the real-network twin of the reference's
    per-claim OpenAI calls, fever_multi_agent.py:235-247 — except
    batched, so a 1M-row stage makes ~1M/batch_size requests, not 1M).

    Protocol (deliberately minimal, adapter-shaped): POST a JSON body
    ``{"prompts": [...]}``; the endpoint answers
    ``{"completions": [...]}`` with one completion per prompt, in
    order. Anything fancier (OpenAI chat schema, auth, streaming) is a
    thin wrapper over ``headers`` + a different body mapping — the
    retry loop, batching, and length contract live here.

    Retries transient failures (HTTP 5xx / connection errors) with
    exponential backoff per batch; a short response (fewer completions
    than prompts) is a protocol error and raises immediately. Runs
    INSIDE the Arrow worker (one connection pool per executor task),
    so the driver never proxies prompt bytes.

    Delivery contract is AT-LEAST-ONCE: a timeout or 5xx after the
    endpoint partially processed a batch re-POSTs the whole batch (and
    Spark task retry re-runs whole partitions), so a billed/generative
    endpoint may see duplicates. Every attempt carries a deterministic
    ``X-Idempotency-Key`` header (sha256 of the batch payload) so an
    endpoint that supports idempotency can dedupe; endpoints that
    don't must tolerate replays. A 200 response that isn't
    ``{"completions": [...]}`` raises ValueError (protocol error), not
    KeyError.
    """

    def respond(prompts: pd.Series) -> pd.Series:
        vals = prompts.tolist()
        out: list[str] = []
        for i in range(0, len(vals), batch_size):
            chunk = vals[i : i + batch_size]
            body = json.dumps({"prompts": chunk}).encode("utf-8")
            idem_key = hashlib.sha256(body).hexdigest()
            last_err: Exception | None = None
            payload = None
            for attempt in range(max_retries + 1):
                req = urllib.request.Request(
                    url,
                    data=body,
                    headers={
                        "Content-Type": "application/json",
                        "X-Idempotency-Key": idem_key,
                        **(headers or {}),
                    },
                )
                try:
                    with urllib.request.urlopen(req, timeout=timeout) as r:
                        payload = json.loads(r.read().decode("utf-8"))
                    last_err = None
                    break
                except urllib.error.HTTPError as e:
                    # 5xx, 429 (rate limit — the common transient for a
                    # shared inference endpoint under fan-out), and 408
                    # retry with backoff; other 4xx = caller bug, fail
                    # fast so Spark's task retry doesn't mask it.
                    if e.code < 500 and e.code not in (408, 429):
                        raise
                    last_err = e
                except (urllib.error.URLError, OSError) as e:
                    last_err = e
                if attempt < max_retries:
                    time.sleep(backoff * (2**attempt))
            if last_err is not None:
                raise last_err
            if not isinstance(payload, dict) or "completions" not in payload:
                raise ValueError(
                    "endpoint returned 200 without a 'completions' key "
                    f"(got: {str(payload)[:120]!r}) — schema-mismatched "
                    "endpoint, not a transient failure"
                )
            comps = payload["completions"]
            if len(comps) != len(chunk):
                raise ValueError(
                    f"endpoint returned {len(comps)} completions for "
                    f"{len(chunk)} prompts"
                )
            out.extend(comps)
        return pd.Series(out, index=prompts.index, dtype=object)

    return respond


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
