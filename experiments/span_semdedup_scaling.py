"""Scaling decades for the round's new dedup families: span-level
exact-substring dedup (operators/span_dedup.py) and SemDeDup
(operators/semdedup.py), measured at sf0.1 x {1, 10, 100} documents
(5k → 50k → 500k docs, ~27M tokens at the top point).

Corpus synthesis follows the established replica rules
(sf1_headline_scaling.py): doc_id shifts by replica * (max_id + 1) and
every token gets a ``-t{r}`` suffix for r > 0, so shingle spaces and
hashed-BoW bucket profiles stay DISJOINT across replicas — the true
duplicate structure is exactly N copies of sf0.1's, the regime where a
correct implementation should be near-linear and anything super-linear
is implementation, not workload.

SemDeDup is measured the way it deploys: k scales with the corpus
(k = N/1000, the paper's cluster-occupancy discipline; the ORACLED
query pins k=4 fixture seeds only so DuckDB can replay assignment).
Centroid training (MLlib KMeans) is timed separately from the dedup
pass — training is the offline step, the pass is the per-corpus cost.

Run: python experiments/span_semdedup_scaling.py   (~6 min local[32])
Results recorded in SCALE_EXPERIMENTS.md "Span dedup + SemDeDup
scaling".
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from bench import _force

from vector_db_setup_spark.functions.text import hashed_bow_vector
from vector_db_setup_spark.operators.ann import kmeans_centroids
from vector_db_setup_spark.operators.semdedup import semdedup_keepers
from vector_db_setup_spark.operators.span_dedup import (
    duplicate_spans,
    span_dedup,
)
from vector_db_setup_spark.session import get_spark

SF_BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/span_scaling"


def build_replicas(spark, mult: int) -> str:
    """mult key-shifted, token-suffixed replicas of SF_BASE documents."""
    path = f"{WORK}/docs_x{mult}"
    if os.path.exists(f"{path}/_SUCCESS"):
        return path
    base = spark.read.parquet(f"{SF_BASE}/documents.parquet")
    shift = base.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for r in range(mult):
        rep = base.select(
            (F.col("doc_id") + F.lit(r * shift)).alias("doc_id"),
            (
                F.col("text")
                if r == 0
                else F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit(f"-t{r}")),
                    ),
                    " ",
                )
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def timed(fn):
    t0 = time.time()
    n = fn()
    return time.time() - t0, n


def main():
    spark = get_spark(app_name="span_semdedup_scaling")
    results = {}
    mults = tuple(
        int(m)
        for m in os.environ.get("SPAN_SCALING_MULTS", "1,10,100").split(",")
    )
    for mult in mults:
        path = build_replicas(spark, mult)
        docs = spark.read.parquet(path)
        n_docs = docs.count()
        row = {"n_docs": n_docs}
        ops = set(
            os.environ.get(
                "SPAN_SCALING_OPS", "spans,lm,semdedup,dsir"
            ).split(",")
        )

        # --- span dedup: detection, then detect+strip ---
        # _force (noop write), NOT count(): under a bare count Catalyst
        # legitimately ELIMINATES span_dedup's final left join (the
        # right side is aggregate-unique and unreferenced), so count()
        # would measure a fraction of the pipeline.
        for label, build in (
            ("spans_detect", lambda: duplicate_spans(docs, n=8)),
            ("span_clean", lambda: span_dedup(docs, n=8)),
        ) if "spans" in ops else ():
            cold, _ = timed(lambda: _force(build()))
            warm, _ = timed(lambda: _force(build()))
            row[label] = {
                "cold_s": round(cold, 2),
                "warm_s": round(warm, 2),
                "rows": build().count(),
            }

        # --- LM-perplexity scoring: train on the replica-0 slice,
        # score everything else (one bigram explode + broadcast joins;
        # expected linear) ---
        if "lm" in ops:
            from vector_db_setup_spark.operators.ngram_lm import (
                lm_counts,
                perplexity_against_lm,
            )

            ref = docs.filter(F.col("doc_id") < 5000)
            lm_state = lm_counts(ref).persist()
            lm_state.count()

            def _lm():
                return perplexity_against_lm(
                    docs.filter(F.col("doc_id") >= 5000), lm_state
                ).count()

            cold, n_scored = timed(_lm)
            warm, _ = timed(_lm)
            row["lm_scoring"] = {
                "cold_s": round(cold, 2),
                "warm_s": round(warm, 2),
                "rows": n_scored,
            }
            lm_state.unpersist()

        # --- DSIR: weights for every raw doc against the replica-0
        # target slice, then the Gumbel top-k (k = N/10). Expected
        # linear: map-side-combined explodes, a <=B-row broadcast
        # log-ratio, a TakeOrderedAndProject over per-doc rows.
        # Like the LM row, the 5000-id split makes x1 DEGENERATE
        # (replica 0 holds ids 0-4999, so the raw slice is empty) —
        # only the x10 -> x100 decade is valid, and `rows` records
        # what the resample actually RETURNED, not the requested k. ---
        if "dsir" in ops:
            from vector_db_setup_spark.operators import dsir

            # deployment shape (r11): the raw pool's features are
            # persisted and passed in, so the pool tokenizes ONCE per
            # measurement instead of per consumer — matching both the
            # oracled queries' per-session memo and the commit-log-
            # maintained pool. Feature build time reported separately
            # (it is the once-per-corpus-version cost).
            raw = docs.filter(F.col("doc_id") >= 5000)
            t0 = time.time()
            rf = dsir.hashed_ngram_counts(raw).persist()
            rf.count()
            feats_s = time.time() - t0

            def _build():
                return dsir.dsir_resample(
                    raw,
                    docs.filter(F.col("doc_id") < 5000),
                    k=max(n_docs // 10, 10),
                    raw_feats=rf,
                )

            cold, _ = timed(lambda: _force(_build()))
            warm, _ = timed(lambda: _force(_build()))
            row["dsir_resample"] = {
                "feats_s": round(feats_s, 2),
                "cold_s": round(cold, 2),
                "warm_s": round(warm, 2),
                "rows": _build().count(),
            }
            rf.unpersist()

        # --- SemDeDup: k scales with N (k = N/1000, floor 4) ---
        if "semdedup" not in ops:
            results[f"x{mult}"] = row
            print(json.dumps({f"x{mult}": row}))
            continue
        vecs = docs.select(
            "doc_id", hashed_bow_vector("text", 64).alias("vec")
        )
        vecs.persist()
        k = max(4, n_docs // 1000)
        t0 = time.time()
        # max_iter=5: centroid QUALITY converges long before default-20
        # for this cost measurement, and training is the offline step —
        # its wall is reported separately from the dedup pass.
        cents = kmeans_centroids(
            vecs, k=k, vec_col="vec", seed=42, max_iter=5
        )
        train_s = time.time() - t0

        def _pass():
            return semdedup_keepers(
                vecs, cents, tau=0.95, vec_col="vec", id_col="doc_id"
            ).count()

        cold, n_keep = timed(_pass)
        warm, _ = timed(_pass)
        row["semdedup"] = {
            "k": k,
            "train_s": round(train_s, 2),
            "cold_s": round(cold, 2),
            "warm_s": round(warm, 2),
            "keepers": n_keep,
            "removed": n_docs - n_keep,
        }
        vecs.unpersist()
        results[f"x{mult}"] = row
        print(json.dumps({f"x{mult}": row}))

    # exponents over each decade (warm — the steady-state number)
    for op in ("spans_detect", "span_clean", "lm_scoring", "semdedup"):
        for lo, hi in (("x1", "x10"), ("x10", "x100")):
            if (
                lo in results and hi in results
                and op in results[lo] and op in results[hi]
            ):
                e = math.log10(
                    results[hi][op]["warm_s"]
                    / max(results[lo][op]["warm_s"], 1e-9)
                )
                print(f"exponent {op} {lo}->{hi}: {e:.2f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
