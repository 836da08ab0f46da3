"""Second decade of headline scaling (VERDICT r8 item 8): sf1 → sf10
warm exponents for the scale-sensitive families (KNN, minhash/ngram/
simhash dedup, events, embedding similarity), falsifying the r8
sf0.1→sf1 extrapolation (worst exponent 0.77) one decade further.

sf10 synthesis = 10 key-shifted replicas OF THE SF1 FIXTURE (itself
10 replicas of sf0.1 — see sf1_headline_scaling.py), so sf10 is 100×
sf0.1: 60M lineitem / 500k documents / 200k vectors. Same
disjointness discipline, one level up:

- keys shift by replica * (max_sf1_key + 1) — the join graph stays
  within each replica.
- documents: every token gets a SECOND-level suffix ``-t{r}`` (r>0),
  so shingle spaces stay disjoint across all 100 effective replicas
  (exact-dup inflation would quadratically distort the dedup
  workloads — the same reasoning as the sf1 synthesis).
- embeddings: rotation cannot disambiguate 100 replicas at dim=64
  (collisions would plant exact-duplicate vectors), so level 2 uses a
  per-replica Rademacher SIGN PATTERN (component i flips iff
  (i * (2r+1)) mod 64 < 32; r=0 verbatim): norm-preserving, distinct
  per replica, no planted near-dups.

Methodology identical to the sf1 script: one session, cold pass then
warm pass per scale, exponents compare warm-to-warm; queries under
~1 s carry the overhead-floor caveat. Requires /tmp/sf1_scaling (the
sf1 script synthesizes it; this script calls that synthesis if
absent).

Run:  python experiments/sf10_headline_scaling.py
(~25 min on local[32]; deterministic.) Results recorded in
SCALE_EXPERIMENTS.md "Headline scaling sf1 → sf10".
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
from experiments.sf1_headline_scaling import (
    BASE_OF,
    SHIFTS,
    synth_sf1,
)
from vector_db_setup_spark import queries as q
from vector_db_setup_spark.session import get_spark

SF1 = os.environ.get("SF1_DIR", "/tmp/sf1_scaling")
OUT = os.environ.get("SF10_DIR", "/tmp/sf10_scaling")
REPS = 10
DIM = 64

# the scale-sensitive families (VERDICT r8 item 8): KNN, dedup, events
QUERIES = [
    "knn_l2_flagship",
    "batch_knn",
    "embedding_similar_topk",
    "minhash_lsh_candidates",
    "ngram_jaccard_topk",
    "simhash_hamming_topk",
    "events_tumbling",
    "events_sessionize",
]


def synth_sf10(spark) -> None:
    if os.path.exists(os.path.join(OUT, "_DONE")):
        print(f"reusing {OUT}")
        return
    os.makedirs(OUT, exist_ok=True)
    bases = {}
    for col, (bt, bc) in BASE_OF.items():
        if col not in bases:
            df = spark.read.parquet(f"{SF1}/{bt}.parquet")
            bases[col] = int(df.agg(F.max(bc)).first()[0]) + 1
    for t in ["region", "nation"]:
        spark.read.parquet(f"{SF1}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{t}.parquet")
    for t, cols in SHIFTS.items():
        src = spark.read.parquet(f"{SF1}/{t}.parquet")
        reps = []
        for r in range(REPS):
            d = src
            for c in cols:
                d = d.withColumn(c, F.col(c) + F.lit(r * bases[c]))
            if t == "documents" and r > 0:
                d = d.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(f"-t{r}")),
                        ),
                        " ",
                    ),
                )
            if t == "embeddings" and r > 0:
                a = 2 * r + 1  # odd -> bijection mod 64
                d = d.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x, i: F.when(
                            (i * a) % DIM < DIM // 2, x
                        ).otherwise(-x),
                    ),
                )
            reps.append(d)
        out = reps[0]
        for d in reps[1:]:
            out = out.unionByName(d)
        out.repartition(64).write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet"
        )
        print(f"  {t}: x{REPS} written")
    open(os.path.join(OUT, "_DONE"), "w").write("ok")


def run_scale(spark, sf_dir: str) -> tuple[dict, dict]:
    qs = q.queries()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    cold, warm = {}, {}
    for out in (cold, warm):
        q.clear_persist_cache(spark)
        for name in QUERIES:
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            out[name] = round(time.perf_counter() - t0, 3)
        print(f"  {'warm' if out is warm else 'cold'}: "
              + json.dumps(out))
    q.clear_persist_cache(spark)
    return cold, warm


def main():
    spark = get_spark(
        app_name="sf10-scaling",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    synth_sf1(spark)
    synth_sf10(spark)
    print("sf1:")
    c1, w1 = run_scale(spark, SF1)
    print("sf10:")
    c10, w10 = run_scale(spark, OUT)
    print(json.dumps({
        "sf1_cold": c1, "sf1_warm": w1,
        "sf10_cold": c10, "sf10_warm": w10,
    }))
    print("\n| query | sf1 warm s | sf10 warm s | exponent (warm) |")
    print("|---|---|---|---|")
    for name in QUERIES:
        a, b = w1[name], w10[name]
        exp = math.log10(b / a) if a > 0 else float("nan")
        print(f"| {name} | {a} | {b} | {exp:.2f} |")
    tot_a, tot_b = sum(w1.values()), sum(w10.values())
    print(
        f"| **total** | {tot_a:.1f} | {tot_b:.1f} | "
        f"{math.log10(tot_b / tot_a):.2f} |"
    )


if __name__ == "__main__":
    main()
