"""One order-of-magnitude scaling point for the 12 HEADLINE queries
(VERDICT r7 item 7): sf0.1 vs a synthesized sf1 (10x rows), measured
in ONE session with identical methodology, growth exponent per query.

sf1 synthesis — 10 replicas of the sf0.1 fixtures with keys shifted
per replica so referential joins stay consistent and no artificial
duplicate blow-up corrupts the dedup workloads:

- fact keys shift by replica * (max_key+1): customer/orders/lineitem/
  part/supplier/events keep their join graph within each replica;
  nation/region dims copy once (sf-invariant, like TPC-H).
- documents: doc_id shifts and every TOKEN gets a per-replica suffix
  (replica 0 verbatim) — replicas are DISJOINT in shingle space, so
  minhash/ngram/simhash see a 10x corpus, not 10 exact copies of each
  doc (which would quadratically inflate candidate pairs within every
  duplicate group and measure a different workload).
- embeddings: vec_id shifts and the vector ROTATES by replica
  positions — same norm distribution, no exact-dup pairs, vec_id 0
  (the KNN query anchor) stays verbatim.

Methodology: per scale, every query runs once cold-in-session (fresh
memo-persist cache; same noop-sink forcing as bench.py) after one
warmup action. exponent = log10(t_sf1 / t_sf01) — 1.0 is linear;
job-scheduling overhead (~0.3-0.5 s) inflates the sf0.1 denominator
for sub-second queries, DEFLATING their apparent exponent; queries
under ~1 s at sf0.1 carry that caveat in the writeup.

Run:  python experiments/sf1_headline_scaling.py
(~12 min on local[32]; deterministic.) Results recorded in
SCALE_EXPERIMENTS.md "Headline scaling sf0.1 → sf1".
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

from bench import HEADLINE, _force
from vector_db_setup_spark import queries as q
from vector_db_setup_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SF1_DIR", "/tmp/sf1_scaling")
REPS = 10

# key columns to shift per replica, per table (dims copy verbatim)
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# the shift base comes from the PARENT key space so FK columns shift
# by the same amount their parent PK does
BASE_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def synth_sf1(spark) -> None:
    if os.path.exists(os.path.join(OUT, "_DONE")):
        print(f"reusing {OUT}")
        return
    os.makedirs(OUT, exist_ok=True)
    bases = {}
    for col, (bt, bc) in BASE_OF.items():
        if col not in bases:
            df = spark.read.parquet(f"{SRC}/{bt}.parquet")
            bases[col] = int(df.agg(F.max(bc)).first()[0]) + 1
    for t in ["region", "nation"]:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{t}.parquet")
    for t, cols in SHIFTS.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        reps = []
        for r in range(REPS):
            d = src
            for c in cols:
                d = d.withColumn(c, F.col(c) + F.lit(r * bases[c]))
            if t == "documents" and r > 0:
                # per-replica token suffix: disjoint shingle space
                d = d.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(f"_{r}")),
                        ),
                        " ",
                    ),
                )
            if t == "embeddings" and r > 0:
                # rotate components: distinct vectors, same norms
                dim = len(src.first()["embedding"])
                k = r % dim
                d = d.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(F.col("embedding"), k + 1, dim - k),
                        F.slice(F.col("embedding"), 1, k),
                    ),
                )
            reps.append(d)
        out = reps[0]
        for d in reps[1:]:
            out = out.unionByName(d)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet"
        )
        print(f"  {t}: x{REPS} written")
    open(os.path.join(OUT, "_DONE"), "w").write("ok")


def run_scale(spark, sf_dir: str) -> tuple[dict, dict]:
    """Cold pass then warm pass. The WARM numbers feed the exponents:
    one shared session means whichever scale runs FIRST pays the
    one-time codegen/Arrow-worker warmup in its cold numbers (a first
    draft of this script compared cold-to-cold and measured a
    NEGATIVE minhash exponent purely from that ordering bias)."""
    qs = q.queries()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    cold, warm = {}, {}
    for out in (cold, warm):
        q.clear_persist_cache(spark)
        for name in HEADLINE:
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            out[name] = round(time.perf_counter() - t0, 3)
        print(f"  {'warm' if out is warm else 'cold'}: "
              + json.dumps(out))
    q.clear_persist_cache(spark)
    return cold, warm


def main():
    spark = get_spark(
        app_name="sf1-scaling",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    synth_sf1(spark)
    print("sf0.1:")
    c_small, t_small = run_scale(spark, SRC)
    print("sf1:")
    c_big, t_big = run_scale(spark, OUT)
    print(json.dumps({
        "sf0.1_cold": c_small, "sf0.1_warm": t_small,
        "sf1_cold": c_big, "sf1_warm": t_big,
    }))
    print("\n| query | sf0.1 warm s | sf1 warm s | exponent (warm) |")
    print("|---|---|---|---|")
    for name in HEADLINE:
        a, b = t_small[name], t_big[name]
        exp = math.log10(b / a) if a > 0 else float("nan")
        print(f"| {name} | {a} | {b} | {exp:.2f} |")
    tot_a = sum(t_small.values())
    tot_b = sum(t_big.values())
    print(
        f"| **total** | {tot_a:.1f} | {tot_b:.1f} | "
        f"{math.log10(tot_b / tot_a):.2f} |"
    )


if __name__ == "__main__":
    main()
