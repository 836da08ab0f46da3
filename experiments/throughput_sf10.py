"""Wall-clock scaling of the curation hot path at 40x the bench corpus
(200k documents ≈ sf4 of the fixture series, 2 orders past the
correctness gate). The recall experiment (recall_characterization.py)
pinned WHAT the LSH families catch; this one pins HOW COST GROWS —
the question the 100 TB design argument rests on: the candidate
generators are keyed equi-joins, so wall time should scale ~linearly
in docs (super-linear growth would reveal a hidden all-pairs).

Corpus: 200,000 docs, uniform vocab-20k, len ~N(100,15), seeded — the
same generator family as the recall experiment, with 5% of docs
near-duplicated (5% token replacement) so the dedup stages do real
work. The 5k-doc slice of the SAME corpus provides the 1x reference
point measured in-process (not compared against bench.py numbers,
which include different data and fixture I/O).

Stages timed (persisted corpus, so timings exclude the generator):
  minhash_lsh   signature + banded candidates (hot-band cap 200)
  exact_dedup   md5 hash-groupBy duplicate groups
  bloom         build over a 5k-doc benchmark's shingles + probe of
                the full corpus (containment per doc)
  text_scan     quality + lang-id + token count, one pass

Run:  python experiments/throughput_sf10.py
(~6 min on local[32]; deterministic.)
Results recorded in SCALE_EXPERIMENTS.md "Curation path wall-clock
scaling at 40x".
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from vector_db_setup_spark.functions.text import lang_id, quality_score, token_count
from vector_db_setup_spark.operators import dedup as dd
from vector_db_setup_spark.operators.bloom import bloom_build, bloom_probe
from vector_db_setup_spark.session import get_spark

SEED = 23
VOCAB = 20_000
N_DOCS = 200_000
DUP_FRAC = 0.05
M_BITS, K = 1 << 24, 5


def build_corpus(path: str, spark, n_docs: int) -> None:
    rng = np.random.default_rng(SEED)
    lens = rng.normal(100, 15, n_docs).clip(30, 200).astype(int)
    base = int(n_docs * (1 - DUP_FRAC))
    rows = []
    docs = []
    for i in range(base):
        d = rng.integers(0, VOCAB, lens[i])
        docs.append(d)
        rows.append((i, " ".join(f"w{t:05d}" for t in d)))
    for j, b in enumerate(rng.choice(base, n_docs - base, replace=False)):
        toks = docs[b].copy()
        mask = rng.random(len(toks)) < 0.05
        toks[mask] = rng.integers(0, VOCAB, int(mask.sum()))
        rows.append((base + j, " ".join(f"w{t:05d}" for t in toks)))
    spark.createDataFrame(rows, "doc_id long, text string").repartition(
        32
    ).write.mode("overwrite").parquet(path)


def run_stages(spark, path: str, label: str) -> dict[str, float]:
    d = spark.read.parquet(path)
    n = d.count()  # warm the scan / file listing outside the timings
    out: dict[str, float] = {}

    t0 = time.perf_counter()
    cands = dd.minhash_lsh_candidates(d, max_band_df=200)
    n_cand = cands.count()
    out["minhash_lsh"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_groups = (
        dd.exact_dedup(d.withColumn("h", F.md5(F.encode("text", "UTF-8"))),
                       ["h"], "doc_id")
        .filter(F.col("group_size") > 1)
        .count()
    )
    out["exact_dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    sh = dd.shingle_hashes(d).distinct()
    bench = sh.filter(F.col("doc_id") < 5000).select("s").distinct()
    words = bloom_build(bench, "s", num_bits=M_BITS, k=K).persist()
    words.count()
    probed = bloom_probe(sh, "s", words, num_bits=M_BITS, k=K)
    n_cont = (
        probed.groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("maybe_member").cast("long")) / F.count(F.lit(1))
                >= 0.5
            ).alias("c")
        )
        .filter("c")
        .count()
    )
    out["bloom_build_probe"] = time.perf_counter() - t0
    words.unpersist()

    t0 = time.perf_counter()
    d.select(
        "doc_id",
        quality_score("text").alias("q"),
        lang_id("text").alias("lang"),
        token_count("text").alias("n_tok"),
    ).write.format("noop").mode("overwrite").save()
    out["text_scan"] = time.perf_counter() - t0

    print(
        f"[{label}] docs={n} cands={n_cand} dup_groups={n_groups} "
        f"contaminated={n_cont}"
    )
    return out


def main() -> None:
    spark = get_spark(app_name="throughput-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        small, large = f"{tmp}/c5k", f"{tmp}/c200k"
        build_corpus(small, spark, 5_000)
        build_corpus(large, spark, N_DOCS)
        # warm pass on the small corpus first: JVM/codegen out of the way
        run_stages(spark, small, "warmup")
        t_small = run_stages(spark, small, "5k")
        t_large = run_stages(spark, large, "200k")
    print("stage          5k(s)   200k(s)  ratio (40x data)")
    for k_ in t_small:
        r = t_large[k_] / t_small[k_]
        print(f"{k_:14s} {t_small[k_]:6.2f}  {t_large[k_]:7.2f}  {r:5.1f}x")


if __name__ == "__main__":
    main()
