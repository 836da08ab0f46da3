"""The maintained perplexity histogram's value proposition, measured:
keeping the CCNet bucket cut points current while the corpus churns via
maintain_ppl_histogram_from_commits (score the DELTA against the frozen
reference LM, fold ±counts into <=n_bins state) vs the batch refresh a
deployment without the maintainer pays (re-score EVERY corpus document
and re-aggregate the percentile per refresh).

Setup: the x10 replica corpus (50k docs; built by
span_semdedup_scaling.py, reused if present) lands as a snapshot table;
a frozen bigram LM bootstraps from its first 5k docs; the histogram
maintainer bootstraps off the commit log over a 5k head; then 8 daily
batches of 4 000 docs append + drain (head grows 5k -> 37k, so the
no-maintainer batch refresh must re-score a growing corpus while the
drain's work stays delta-sized). Each day measures:

  - drain wall (maintainer: score 1k delta docs, fold into the state)
  - cut-point read (quantiles_from_histogram over <=n_bins state rows)
  - batch refresh wall (perplexity_against_lm over the WHOLE head +
    exact percentile — the no-maintainer cost for the same answer)

and cross-checks: maintained cut points within one bin width of the
batch-exact percentiles every day.

Run: python experiments/ppl_histogram_delta.py    (~4 min local[32])
Results recorded in SCALE_EXPERIMENTS.md "Perplexity histogram delta
cost".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from vector_db_setup_spark.operators.ngram_lm import (
    lm_counts,
    perplexity_against_lm,
    quantiles_from_histogram,
)
from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    read_snapshot,
    write_snapshot,
)
from vector_db_setup_spark.streaming.commit_log import (
    maintain_ppl_histogram_from_commits,
)

SF_BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
X10 = "/tmp/span_scaling/docs_x10"
GEO = dict(lo=0.0, hi=5000.0, n_bins=1024)
PROBS = (1.0 / 3, 2.0 / 3)
N_DAYS = 8
BATCH = 4000


def main():
    spark = get_spark(app_name="ppl_histogram_delta")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(f"{X10}/_SUCCESS"):
        docs = spark.read.parquet(X10)
    else:
        docs = spark.read.parquet(f"{SF_BASE}/documents.parquet")
    docs = docs.select("doc_id", "text")
    n = docs.count()
    head0 = docs.filter(F.col("doc_id") < 5000)
    pool = docs.filter(F.col("doc_id") >= 5000).persist()
    pool.count()

    work = tempfile.mkdtemp(prefix="ppl_hist_delta_")
    src = f"{work}/src"
    lm = f"{work}/lm"
    hist = f"{work}/hist"
    ck = f"{work}/ck"
    try:
        # frozen reference LM from the static slice
        write_snapshot(lm_counts(head0), lm, meta={"kind": "bigram_lm"})
        lm_df = read_snapshot(spark, lm).persist()
        lm_df.count()
        # day 0: 5k-docs head
        write_snapshot(
            pool.filter(F.col("doc_id") < 10_000), src
        )
        drain = lambda: maintain_ppl_histogram_from_commits(  # noqa: E731
            spark, src, lm, hist, ck, **GEO,
            text_col="text", key_col="doc_id",
        )
        t0 = time.time()
        drain()
        print(json.dumps({"bootstrap_s": round(time.time() - t0, 2),
                          "head_docs": 5000, "corpus_total": n}))
        days = []
        lo_id = 10_000
        for day in range(1, N_DAYS + 1):
            batch = pool.filter(
                (F.col("doc_id") >= lo_id)
                & (F.col("doc_id") < lo_id + BATCH)
            )
            lo_id += BATCH
            append_snapshot(batch, src)
            t0 = time.time()
            drain()
            drain_s = time.time() - t0
            t0 = time.time()
            cuts = quantiles_from_histogram(
                read_snapshot(spark, hist), PROBS, **GEO
            )
            cuts_s = time.time() - t0
            t0 = time.time()
            per = perplexity_against_lm(read_snapshot(spark, src), lm_df)
            exact = per.agg(
                *[F.percentile("ppl", F.lit(p)) for p in PROBS]
            ).collect()[0]
            batch_s = time.time() - t0
            width = (GEO["hi"] - GEO["lo"]) / GEO["n_bins"]
            ok = all(
                abs(cuts[i] - float(exact[i])) <= width
                for i in range(len(PROBS))
            )
            days.append({
                "day": day,
                "drain_s": round(drain_s, 2),
                "cuts_s": round(cuts_s, 2),
                "batch_refresh_s": round(batch_s, 2),
                "cuts": cuts,
                "exact": [round(float(x), 3) for x in exact],
                "within_bin_width": ok,
            })
            print(json.dumps(days[-1]))
        print(json.dumps({"days": days}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
