#!/usr/bin/env python3
"""Runnable end-to-end walkthrough: everything the reference deployment
does (dangni02/vector-db-setup), on this engine.

    python3 examples/run_reference_workload.py [sf_dir]

Steps mirror the reference's three entry points (SURVEY.md §3):
setup.sh's load → test_connection.py's smoke → fever_multi_agent.py's
retrieval + pipeline + eval — plus the index-build and dedup extensions.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_db_setup_spark.facade import Engine
from vector_db_setup_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="reference-workload")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, sf_dir)

    print("== 1. connection / catalog smoke (test_connection.py) ==")
    print("   table + count + sample OK:", eng.test_connection())
    print("   random-vector KNN OK:    ", eng.test_vector_search())

    print("== 2. claims → retrieve → answer → judge → edit (fever_multi_agent.py) ==")
    workdir = tempfile.mkdtemp(prefix="fever_")
    claims_path = os.path.join(workdir, "claims.jsonl")
    docs_df = __import__(
        "vector_db_setup_spark.sources.registry", fromlist=["load_table"]
    ).load_table(spark, sf_dir, "documents")
    with open(claims_path, "w") as f:
        for row in docs_df.limit(3).collect():
            f.write(
                json.dumps(
                    {"id": row["doc_id"], "claim": row["text"], "label": "SUPPORTS"}
                )
                + "\n"
            )
    claims = eng.load_claims_from_jsonl(claims_path, limit=3)
    results = []
    for c in claims:
        r = eng.run_fever_pipeline(c["claim"], k=5)
        r["label"] = c["label"]
        results.append(r)
        print(f"   claim {c['id']}: {r['final']} (docs={len(r['docs'])})")
    acc = eng.evaluate_predictions(results)
    out_path = os.path.join(workdir, "fever_results.json")
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(results, f, ensure_ascii=False, indent=2)
    print(f"   accuracy {acc:.2f}; results → {out_path}")

    print("== 3. batch index build + ANN probe (north-star V6) ==")
    from vector_db_setup_spark.operators.ann import (
        ivf_assign,
        ivf_search,
        ivf_write,
        kmeans_centroids,
    )
    from vector_db_setup_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, k=8)
    idx_path = os.path.join(workdir, "ivf")
    ivf_write(ivf_assign(emb, cents), idx_path)
    idx = spark.read.parquet(idx_path)
    q = emb.first()["embedding"]
    hits = ivf_search(idx, cents, list(q), k=5, nprobe=4).collect()
    print(f"   IVF index at {idx_path}; probe top-5: {[r['vec_id'] for r in hits]}")

    print("== 4. corpus dedup + quality (north-star pipeline) ==")
    import __spark_entry__ as ent

    clean = ent.queries()["corpus_clean"](spark, sf_dir).collect()
    print("   clean corpus per lang:", {r["lang"]: r["n_clean"] for r in clean})

    print("== 5. training-data prep: verdict → chunk → pack → mix (r4) ==")
    qs = ent.queries()
    verdict = qs["corpus_curation_verdict"](spark, sf_dir)
    kept = verdict.filter("keep").count()
    dropped = verdict.filter("NOT keep").count()
    print(f"   curation verdict: keep {kept} / drop {dropped}")
    chunks = qs["doc_chunking"](spark, sf_dir)
    print(
        "   chunking (size 64 / stride 48):",
        f"{chunks.count()} chunks from {chunks.select('doc_id').distinct().count()} docs",
    )
    bins = qs["context_packing"](spark, sf_dir)
    print(
        "   packing: ",
        f"{bins.count()} bins of ≤2048 tokens across "
        f"{bins.select('source').distinct().count()} sources",
    )
    mix = qs["corpus_mixture_plan"](spark, sf_dir).orderBy("source").limit(3).collect()
    print(
        "   mixture plan (first 3 sources):",
        {r["source"]: (r["sample_rate"], r["planned_tokens"]) for r in mix},
    )
    print("done.")


if __name__ == "__main__":
    main()
