"""sf1 → sf10 exponents for the EXTENDED bench set (r9 follow-up to
sf10_headline_scaling.py): the corpus-heavy composite operators —
dedup keepers (candidate pairs → connected components → keeper
election), corpus curation, semantic dedup, multiband embedding
pairs, Bloom benchmark overlap, blocked batch KNN, blocked retrieval
eval — at the second decade. The headline sweep caught a real
super-linearity (embedding_similar_topk's fixed block count); this
sweep applies the same falsification to the operators whose scale
behavior is composite (join + CC + window), where a hidden
all-pairs or an unguarded driver kernel would show up as exponent>1.

Note the dedup family's fixture property: sf10 documents are
token-suffix-DISJOINT across replicas, so true duplicate structure is
100 copies of sf0.1's — candidate-pair count grows linearly by
construction, which is exactly the regime where a correct banded join
should stay near-linear and anything super-linear is implementation,
not workload.

Requires /tmp/sf1_scaling + /tmp/sf10_scaling (built by
sf10_headline_scaling.py). Run:
python experiments/sf10_extended_scaling.py   (~15 min on local[32])
Results recorded in SCALE_EXPERIMENTS.md "Extended-set scaling
sf1 → sf10".
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

from bench import _force
from vector_db_setup_spark import queries as q
from vector_db_setup_spark.session import get_spark

SF1 = os.environ.get("SF1_DIR", "/tmp/sf1_scaling")
SF10 = os.environ.get("SF10_DIR", "/tmp/sf10_scaling")

QUERIES = [
    "dedup_keepers",
    "corpus_curation_verdict",
    "semantic_dedup_keepers",
    "embedding_multiband_pairs",
    "benchmark_overlap_bloom",
    "batch_knn_blocked",
    "retrieval_eval_blocked",
    "leakage_safe_split",
]


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
    for d in (SF1, SF10):
        if not os.path.exists(os.path.join(d, "_DONE")):
            raise SystemExit(
                f"{d} missing — run experiments/sf10_headline_scaling.py "
                "first (it synthesizes both fixtures)"
            )
    spark = get_spark(
        app_name="sf10-extended",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    print("sf1:")
    c1, w1 = run_scale(spark, SF1)
    print("sf10:")
    c10, w10 = run_scale(spark, SF10)
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
