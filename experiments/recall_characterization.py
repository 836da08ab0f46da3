"""Measured recall/precision of the near-duplicate families at sf1
scale (VERDICT r4 item 5: all prior recall evidence was planted
fixtures at sf0.01 scale — this pins the production thresholds against
a 50k-document corpus with KNOWN ground truth).

Corpus: 34k base documents (uniform vocab-20k tokens, len ~N(100,15))
plus 4k near-duplicates at each token-replacement rate in
{2%, 5%, 15%, 30%} — 50k docs, 16k planted (base, dup) pairs. Ground
truth is NOT the nominal rate: the exact 3-shingle Jaccard (and exact
embedding cosine) of every planted pair is computed in Spark with the
same shingle/embedding definitions the production operators use, and
pairs are bucketed by that measured similarity.

For each family x config the script reports, per ground-truth bucket:
  recall    = planted pairs surfaced as candidates / planted pairs
  precision = candidates that are true near-dups (exact J >= 0.5, or
              cosine >= 0.8 for the semantic family) / all candidates
  n_cand    = emitted candidate count (the cost driver at scale)

Run:  python experiments/recall_characterization.py
(~5 min on local[32]; deterministic — all RNG seeded.)
Results are recorded in SCALE_EXPERIMENTS.md "LSH recall at sf1".
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from vector_db_setup_spark.operators import dedup as dd
from vector_db_setup_spark.operators.similarity import cosine_pairs_bucketed
from vector_db_setup_spark.session import get_spark

SEED = 11
VOCAB = 20_000
N_BASE = 34_000
N_DUP = 4_000
RATES = (0.02, 0.05, 0.15, 0.30)
J_BUCKETS = [(0.9, 1.01), (0.7, 0.9), (0.5, 0.7), (0.3, 0.5), (0.1, 0.3)]
COS_BUCKETS = [(0.95, 1.01), (0.88, 0.95), (0.80, 0.88), (0.70, 0.80)]


def build_corpus():
    rng = np.random.default_rng(SEED)
    lens = rng.normal(100, 15, N_BASE).clip(30, 200).astype(int)
    docs = [rng.integers(0, VOCAB, n) for n in lens]
    rows = [
        (i, " ".join(f"w{t:05d}" for t in d)) for i, d in enumerate(docs)
    ]
    pairs = []
    did = N_BASE
    for rate in RATES:
        for b in rng.choice(N_BASE, N_DUP, replace=False):
            toks = docs[b].copy()
            mask = rng.random(len(toks)) < rate
            toks[mask] = rng.integers(0, VOCAB, int(mask.sum()))
            rows.append((did, " ".join(f"w{t:05d}" for t in toks)))
            pairs.append((int(b), did, rate))
            did += 1
    corpus = pd.DataFrame(rows, columns=["doc_id", "text"])
    planted = pd.DataFrame(pairs, columns=["id_a", "id_b", "rate"])
    return corpus, planted


def exact_jaccard(spark, docs, pairs):
    """Exact packed-3-shingle Jaccard for the given (id_a, id_b) pairs —
    the same shingle definition (dedup.shingle_hashes) the MinHash and
    n-gram operators consume."""
    sh = dd.shingle_hashes(docs).distinct().persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("id_a"), "s")
    b = sh.select(F.col("doc_id").alias("id_b"), "s")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .fillna(0, ["inter"])
        .join(sizes.withColumnRenamed("doc_id", "id_a")
              .withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("inter")
             / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
             ).alias("jac"),
        )
    )
    return out


def bucket_recall(truth_pdf, cand_keys, buckets, sim_col):
    rows = []
    for lo, hi in buckets:
        sel = truth_pdf[(truth_pdf[sim_col] >= lo) & (truth_pdf[sim_col] < hi)]
        if not len(sel):
            rows.append((f"[{lo},{hi})", 0, float("nan")))
            continue
        hit = sum(
            1 for t in zip(sel.id_a, sel.id_b)
            if (min(t), max(t)) in cand_keys
        )
        rows.append((f"[{lo},{hi})", len(sel), hit / len(sel)))
    return rows


def main():
    import sys

    only_semantic = "--only-semantic" in sys.argv
    spark = get_spark(app_name="recall-characterization")
    corpus, planted = build_corpus()
    docs = spark.createDataFrame(corpus).repartition(32).persist()
    print(f"corpus: {docs.count()} docs, {len(planted)} planted pairs")
    pairs_df = spark.createDataFrame(planted[["id_a", "id_b"]])

    truth = exact_jaccard(spark, docs, pairs_df).toPandas()
    truth = truth.merge(planted, on=["id_a", "id_b"])
    print("\nexact Jaccard by nominal mutation rate:")
    print(truth.groupby("rate")["jac"].describe()[["mean", "min", "max"]])

    report = []

    # ---- MinHash LSH --------------------------------------------------
    for num_hashes, bands in () if only_semantic else ((8, 4), (16, 8), (16, 4)):
        r = num_hashes // bands
        t0 = time.time()
        cand = (
            dd.minhash_lsh_candidates(
                docs, bands=bands, num_hashes=num_hashes
            )
            .toPandas()
        )
        dt = time.time() - t0
        keys = set(zip(cand.id_a, cand.id_b))
        # precision: exact J of every emitted candidate
        cj = exact_jaccard(
            spark, docs, spark.createDataFrame(cand[["id_a", "id_b"]])
        ).toPandas()
        prec = float((cj.jac >= 0.5).mean()) if len(cj) else float("nan")
        rec = bucket_recall(truth, keys, J_BUCKETS, "jac")
        label = f"minhash h={num_hashes} b={bands} r={r} (J*~{(1/bands)**(1/r):.2f})"
        report.append((label, rec, prec, len(keys), dt))

    # ---- SimHash banded ----------------------------------------------
    sim = dd.simhash(docs).persist()
    sim.count()
    for max_h in () if only_semantic else (2, 3, 6):
        t0 = time.time()
        cand = dd.simhash_banded_pairs(sim, max_hamming=max_h).toPandas()
        dt = time.time() - t0
        keys = set(zip(cand.id_a, cand.id_b))
        cj = exact_jaccard(
            spark, docs, spark.createDataFrame(cand[["id_a", "id_b"]])
        ).toPandas() if len(cand) else pd.DataFrame({"jac": []})
        prec = float((cj.jac >= 0.5).mean()) if len(cj) else float("nan")
        rec = bucket_recall(truth, keys, J_BUCKETS, "jac")
        report.append(
            (f"simhash 32-bit 4-band maxham={max_h}", rec, prec, len(keys), dt)
        )

    # ---- Semantic (TF-IDF projection embeddings + sign-LSH buckets) --
    from vector_db_setup_spark.functions.embed import embed_with_model
    from vector_db_setup_spark.functions.np_encoder import (
        fit_encoder,
        numpy_encoder_loader,
    )
    import os
    import tempfile

    enc = fit_encoder(docs, vocab_size=8192, dim=64, seed=7)
    art = os.path.join(tempfile.mkdtemp(), "enc.npz")
    enc.save(art)
    emb = (
        embed_with_model(
            docs.select("doc_id", "text"), numpy_encoder_loader(art)
        )
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .persist()
    )
    emb.count()
    # exact cosine ground truth for planted pairs (normalized rows ->
    # dot product)
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ctruth = (
        pairs_df.join(ea, "id_a").join(eb, "id_b")
        .select("id_a", "id_b", dot.alias("cos"))
        .toPandas()
        .merge(planted, on=["id_a", "id_b"])
    )
    print("\nexact cosine by nominal mutation rate:")
    print(ctruth.groupby("rate")["cos"].describe()[["mean", "min", "max"]])

    rng = np.random.default_rng(13)
    planes = rng.standard_normal((8, 64))
    for min_cos in (0.95, 0.88, 0.80):
        t0 = time.time()
        cand = cosine_pairs_bucketed(
            emb, planes, min_cosine=min_cos
        ).toPandas()
        dt = time.time() - t0
        keys = set(
            (min(a, b), max(a, b)) for a, b in zip(cand.id_a, cand.id_b)
        )
        prec = float((cand.cosine >= 0.8).mean()) if len(cand) else float("nan")
        rec = bucket_recall(ctruth, keys, COS_BUCKETS, "cos")
        report.append(
            (f"semantic 8-plane buckets cos>={min_cos}", rec, prec, len(keys), dt)
        )

    # ---- Semantic multiband (OR-amplification across plane sets) -----
    from vector_db_setup_spark.operators.similarity import (
        cosine_pairs_multiband,
    )

    band_sets = [
        np.random.default_rng(100 + i).standard_normal((8, 64))
        for i in range(4)
    ]
    for nb in (2, 4):
        t0 = time.time()
        cand = cosine_pairs_multiband(
            emb, band_sets[:nb], min_cosine=0.88
        ).toPandas()
        dt = time.time() - t0
        keys = set(
            (min(a, b), max(a, b)) for a, b in zip(cand.id_a, cand.id_b)
        )
        prec = float((cand.cosine >= 0.8).mean()) if len(cand) else float("nan")
        rec = bucket_recall(ctruth, keys, COS_BUCKETS, "cos")
        report.append(
            (f"semantic {nb}x8-plane bands cos>=0.88", rec, prec, len(keys), dt)
        )

    # ---- report ------------------------------------------------------
    print("\n| config | " + " | ".join(f"recall {b[0]}" for b, *_ in
          [(x,) for x in J_BUCKETS]) + " | precision | n_cand | sec |")
    for label, rec, prec, ncand, dt in report:
        cells = " | ".join(
            f"{r:.3f}" if r == r else "—" for _, n, r in rec
        )
        print(f"| {label} | {cells} | {prec:.3f} | {ncand} | {dt:.1f} |")
        for bname, n, r in rec:
            print(f"    {bname}: n={n} recall={r if r==r else float('nan'):.3f}"
                  if r == r else f"    {bname}: n={n} recall=—")


if __name__ == "__main__":
    main()
