#!/usr/bin/env python3
"""Runnable end-to-end TRAINING-DATA pipeline: the at-scale curation
flow this engine adds beyond the reference surface, composed from the
library operators (each one individually oracle- or invariant-checked;
this script shows they compose).

    python3 examples/run_training_pipeline.py [sf_dir]

profile -> dedup (exact + MinHash-LSH + connected components) ->
semantic near-dup (real numpy encoder + multiband cosine LSH) ->
PII scrub -> mixture plan + deterministic sample -> chunk/pack ->
heavy-hitter sketch. Every stage is DataFrame-lazy until its action;
nothing corpus-sized touches the driver.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_db_setup_spark import queries as q
from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.registry import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="training-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    qs = q.queries()
    docs = load_table(spark, sf_dir, "documents")

    print("== 0. data-quality contract gate ==")
    from vector_db_setup_spark.operators.validate import enforce

    enforce(
        docs,
        [
            {"rule": "not_null", "col": "doc_id"},
            {"rule": "unique", "col": "doc_id"},
            {"rule": "min_rows", "n": 10},
        ],
    )
    print("   contract OK (not_null + unique doc_id, min_rows)")

    print("== 1. corpus profile ==")
    prof = qs["lang_stats"](spark, sf_dir).collect()
    print("   language mix:", {r[0]: r[1] for r in prof})

    print("== 2. lexical dedup (exact + MinHash-LSH + CC keepers) ==")
    keepers = qs["dedup_keepers"](spark, sf_dir)
    n_keep = keepers.count()
    print(f"   {docs.count()} docs -> {n_keep} keepers")

    print("== 2b. span-level exact-substring dedup (Lee et al.) ==")
    from vector_db_setup_spark.operators.span_dedup import span_dedup

    cleaned = span_dedup(docs.select("doc_id", "text"), n=8)
    removed_tokens = cleaned.agg(F.sum("n_removed")).first()[0] or 0
    n_touched = cleaned.filter(F.col("n_removed") > 0).count()
    print(
        f"   {n_touched} docs had repeated passages stripped "
        f"({removed_tokens} tokens; first occurrence kept corpus-wide)"
    )

    print("== 3. semantic near-dup (real encoder + multiband LSH) ==")
    from vector_db_setup_spark.functions.embed import embed_with_model
    from vector_db_setup_spark.functions.np_encoder import (
        fit_encoder,
        numpy_encoder_loader,
    )
    from vector_db_setup_spark.operators.ann import random_hyperplanes
    from vector_db_setup_spark.operators.similarity import (
        cosine_pairs_multiband,
    )

    enc = fit_encoder(docs, vocab_size=1024, dim=32, seed=7)
    art = os.path.join(tempfile.mkdtemp(prefix="enc_"), "encoder.npz")
    enc.save(art)
    emb = embed_with_model(
        docs.select("doc_id", "text"), numpy_encoder_loader(art)
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    bands = [random_hyperplanes(32, 6, seed=s) for s in (1, 2)]
    sem_pairs = cosine_pairs_multiband(emb, bands, min_cosine=0.9)
    print(f"   semantic near-dup pairs (cos>=0.9, 2 bands): {sem_pairs.count()}")

    print("== 3b. SemDeDup (cluster-partitioned, keep-least-central) ==")
    import numpy as np

    from vector_db_setup_spark.operators.ann import kmeans_centroids
    from vector_db_setup_spark.operators.semdedup import semdedup_keepers

    k = max(4, emb.count() // 100)
    cents = kmeans_centroids(emb, k=k, seed=11, max_iter=5)
    sem_keep = semdedup_keepers(emb, cents, tau=0.92).count()
    print(f"   {sem_keep} keepers after SemDeDup at tau=0.92, k={k}")

    print("== 3c. span-level benchmark decontamination ==")
    from vector_db_setup_spark.operators.span_dedup import (
        contaminated_spans,
        strip_spans,
    )

    half = docs.agg(F.expr("percentile(doc_id, 0.1)")).first()[0]
    bench = docs.filter(F.col("doc_id") <= half)
    train = docs.filter(F.col("doc_id") > half)
    cont = contaminated_spans(train, bench, n=5)
    n_cont = cont.select("doc_id").distinct().count()
    salvaged = strip_spans(train, cont)
    print(
        f"   {n_cont} training docs echo the held-out slice; spans cut, "
        f"{salvaged.filter(F.col('n_removed') > 0).count()} salvaged"
    )

    print("== 4. PII scrub ==")
    pii = qs["doc_pii_scrub"](spark, sf_dir)
    hits = pii.filter("n_emails + n_digit_runs > 0").count()
    print(f"   docs with redactions: {hits}")

    print("== 5. mixture plan -> deterministic sample ==")
    plan = qs["corpus_mixture_plan"](spark, sf_dir).collect()
    sample = qs["corpus_mixture_sample"](spark, sf_dir).collect()
    planned = sum(r["planned_tokens"] for r in plan)
    realized = sum(r["sampled_tokens"] for r in sample)
    print(f"   planned {planned} tokens, hash-gate realized {realized}")

    print("== 6. chunk + pack ==")
    packed = qs["context_packing"](spark, sf_dir)
    bins = packed.count()
    print(f"   {bins} (source, bin) groups at 2048-token budget")

    print("== 6b. learned quality filter (distilled classifier) ==")
    from vector_db_setup_spark.operators.quality_model import (
        score_quality,
        train_quality_model,
    )

    qmodel = train_quality_model(docs)
    scored = score_quality(qmodel, docs)
    n_model_drop = scored.filter(F.col("p_keep") < 0.5).count()
    print(
        f"   model drops {n_model_drop}/{docs.count()} docs at p_keep<0.5 "
        "(heuristic-distilled LR over hashed BOW)"
    )

    print("== 6c. LM-perplexity filter (CCNet terciles) ==")
    ppl = qs["lm_perplexity_buckets"](spark, sf_dir)
    tiles = {r["bucket"]: r["n"] for r in
             ppl.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"   perplexity terciles over the scored slice: {tiles or 'n/a at this sf'}")

    print("== 7. heavy-hitter sketch (CMS) ==")
    hh = qs["hot_tokens_cms"](spark, sf_dir).collect()
    print("   estimates:", {r["token"]: r["est_count"] for r in hh})

    print("== 7b. tokenizer training (distributed BPE) ==")
    from vector_db_setup_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        bpe_vocab,
        word_freq_table,
    )

    merges = bpe_train(word_freq_table(docs), n_merges=16)
    n_tok = (
        bpe_encode(docs.limit(20), merges)
        .select(F.sum(F.size("bpe_tokens")))
        .collect()[0][0]
    )
    print(f"   {len(merges)} merges learned; vocab head: "
          f"{bpe_vocab(merges)[:5]}; 20 docs -> {n_tok} BPE tokens")

    print("== 8. land training shards + audit ==")
    from vector_db_setup_spark.sources.shards import (
        verify_shards,
        write_training_shards,
    )

    dest = os.path.join(tempfile.mkdtemp(prefix="shards_"), "corpus")
    kept = docs.join(keepers.select("doc_id"), "doc_id", "left_semi")
    manifest = write_training_shards(
        kept.select("doc_id", "text"), dest, n_shards=8, seed=7
    )
    audit_ok = all(r["ok"] for r in verify_shards(spark, dest).collect())
    print(
        f"   {manifest.count()} shards, "
        f"{sum(r['n_docs'] for r in manifest.collect())} docs, "
        f"audit {'OK' if audit_ok else 'FAILED'}"
    )
    if not audit_ok:
        raise SystemExit("shard audit failed")

    print("PIPELINE OK")


if __name__ == "__main__":
    main()
