"""The span occurrence index's value proposition, measured: answering
"which spans of TODAY'S batch duplicate anything ever ingested" via
the maintained index (operators/span_dedup.spans_against_index) vs
re-running batch detection over the whole corpus
(duplicate_spans(head)) — the re-shingling the index amortizes.

Setup: the x10 replica corpus (50k docs, ~2.7M tokens; built by
span_semdedup_scaling.py) lands as a snapshot table, the index
bootstraps off the commit log, then 10 daily batches of 500 docs
(half echoing existing passages, half fresh) append + drain. Each
day measures:

  - drain wall (maintainer: shingle the delta, one merge commit)
  - delta query wall (spans_against_index on the 500 new docs)
  - batch query wall (duplicate_spans over the whole head — what a
    deployment without the index pays for the same answer)

Run: python experiments/span_index_delta.py    (~6 min local[32])
Results recorded in SCALE_EXPERIMENTS.md "Span index delta cost".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import shutil
import tempfile

from pyspark.sql import functions as F

from vector_db_setup_spark.operators.span_dedup import (
    duplicate_spans,
    spans_against_index,
)
from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    compact_if,
    read_snapshot,
    write_snapshot,
)
from vector_db_setup_spark.streaming.commit_log import (
    maintain_span_index_from_commits,
)

CORPUS = "/tmp/span_scaling/docs_x10"


def main() -> None:
    spark = get_spark(app_name="span_index_delta")
    if not os.path.exists(f"{CORPUS}/_SUCCESS"):
        raise SystemExit(
            "build the replica corpora first: "
            "SPAN_SCALING_MULTS=10 python experiments/span_semdedup_scaling.py"
        )
    root = tempfile.mkdtemp(prefix="span_delta_")
    src, idx, ck = f"{root}/src", f"{root}/idx", f"{root}/ck"
    try:
        base = spark.read.parquet(CORPUS).select("doc_id", "text")
        write_snapshot(base, src, stats_cols=["doc_id"])
        kw = dict(text_col="text", key_col="doc_id", shingle_n=8)
        t0 = time.time()
        maintain_span_index_from_commits(spark, src, idx, ck, **kw)
        print(json.dumps({"bootstrap_s": round(time.time() - t0, 2)}))

        echo_pool = base.orderBy("doc_id").limit(250).collect()
        days = []
        for day in range(10):
            lo = 10_000_000 + day * 1000
            echo = [
                (lo + i, r["text"]) for i, r in enumerate(echo_pool)
            ]
            fresh = [
                (
                    lo + 500 + i,
                    " ".join(
                        f"d{day}w{i}t{j}" for j in range(20)
                    ),
                )
                for i in range(250)
            ]
            delta = spark.createDataFrame(
                echo + fresh, "doc_id long, text string"
            )
            append_snapshot(delta, src, stats_cols=["doc_id"])
            t0 = time.time()
            maintain_span_index_from_commits(spark, src, idx, ck, **kw)
            # absorb the INDEX's merge-on-read debt when it crosses the
            # read-tax threshold (keep_meta: the cursor lives in the
            # marker) — without this the delta query creeps with the
            # index's commit stack (first measurement: 3.4 -> 5.9 s
            # over 10 days)
            compacted = compact_if(
                spark, idx, max_data_dirs=4, max_delete_entries=3,
                keep_meta=True,
            )
            drain_s = time.time() - t0

            t0 = time.time()
            n_delta = spans_against_index(
                delta, read_snapshot(spark, idx), n=8
            ).count()
            delta_q_s = time.time() - t0

            t0 = time.time()
            n_batch = (
                duplicate_spans(read_snapshot(spark, src), n=8)
                .filter(F.col("doc_id") >= lo)
                .count()
            )
            batch_q_s = time.time() - t0
            days.append(
                {
                    "day": day,
                    "drain_s": round(drain_s, 2),
                    "compacted": compacted is not None,
                    "delta_query_s": round(delta_q_s, 2),
                    "batch_query_s": round(batch_q_s, 2),
                    "delta_spans": n_delta,
                    "batch_spans_in_delta": n_batch,
                }
            )
            print(json.dumps(days[-1]))
        first, last = days[0], days[-1]
        print(
            json.dumps(
                {
                    "speedup_first": round(
                        first["batch_query_s"] / first["delta_query_s"], 1
                    ),
                    "speedup_last": round(
                        last["batch_query_s"] / last["delta_query_s"], 1
                    ),
                    "drain_flat": round(
                        last["drain_s"] / max(first["drain_s"], 1e-9), 2
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
