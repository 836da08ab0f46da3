"""Reference-compatible API facade.

Drop-in surface for users of the reference scripts: the function names
and shapes of fever_multi_agent.py / test_connection.py, backed by the
Spark engine. A reference user's calling code keeps working with a
session+data-dir handle instead of a psycopg2 connection:

    reference                               here
    ---------                               ----
    connect_db()                         →  Engine(spark, sf_dir)
    get_embedding(text)                  →  engine.get_embedding(text)
    retrieve_from_vectordb(claim, k)     →  engine.retrieve_from_vectordb(claim, k)
    run_fever_pipeline(claim, ...)       →  engine.run_fever_pipeline(claim, ...)
    load_claims_from_jsonl(path, limit)  →  engine.load_claims_from_jsonl(path, limit)
    evaluate_predictions(results)        →  engine.evaluate_predictions(results)
    test_connection()/test_vector_search()→ engine.test_connection()/test_vector_search()

Cited reference lines in each method. The embedding model is the
deterministic hash embedder (functions/embed) at the fixture dim —
swap `hash_embed_udf` for a real sentence-transformer adapter without
touching callers (same seam as the reference's get_embedding,
fever_multi_agent.py:54-56).
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from vector_db_setup_spark.functions.embed import hash_embed_expr
from vector_db_setup_spark.operators.knn import knn_topk
from vector_db_setup_spark.sources.registry import load_table, table_exists


class Engine:
    """Session + data-dir handle (replaces the per-query psycopg2
    connection of fever_multi_agent.py:24-35,60,78)."""

    def __init__(self, spark: SparkSession, sf_dir: str, dim: int = 64):
        self.spark = spark
        self.sf_dir = sf_dir
        self.dim = dim

    # -- fever_multi_agent.py:49-56 (SentenceTransformer.encode) --
    def get_embedding(self, text: str) -> list[float]:
        row = (
            self.spark.range(1)
            .select(hash_embed_expr(F.lit(text), dim=self.dim).alias("e"))
            .first()
        )
        return [float(x) for x in row["e"]]

    # -- fever_multi_agent.py:58-82 (SELECT id, content, distance … LIMIT k) --
    def retrieve_from_vectordb(self, claim: str, top_k: int = 5) -> list[str]:
        docs = load_table(self.spark, self.sf_dir, "documents")
        embs = load_table(self.spark, self.sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        qvec = self.get_embedding(claim)
        joined = docs.join(embs, docs.doc_id == embs.vec_id).filter(
            F.col("text").isNotNull() & (F.length("text") > 0)  # :81 truthiness
        )
        # fixture embeddings are 64-d; pad/trim the query to match
        qvec = (qvec + [0.0] * 64)[:64]
        rows = knn_topk(
            joined, "embedding", qvec, k=top_k, id_col="doc_id"
        ).collect()
        return [r["text"] for r in rows]

    # -- fever_multi_agent.py:222-255 (retrieve → answer×3 → judge → edit) --
    def run_fever_pipeline(
        self,
        claim: str,
        k: int = 5,
        judge_mode: str = "voting",
        editor_strength: str = "light",
    ) -> dict:
        from vector_db_setup_spark.operators.llm import det_respond

        import pandas as pd

        docs = self.retrieve_from_vectordb(claim, top_k=k)
        context = "\n\n".join(
            f"[Doc {i + 1}] {d}" for i, d in enumerate(docs)  # :126
        )
        styles = ["precise", "balanced", "creative"]  # :235-239
        answers = list(
            det_respond(pd.Series([f"{claim}|{s}|{context}" for s in styles]))
        )
        counts = {a: answers.count(a) for a in set(answers)}  # :166-176
        judged = max(sorted(counts), key=lambda a: counts[a])
        final = f"Verdict: {judged}"  # :202-217 (light)
        if editor_strength == "strong":
            final = final.upper()
        return {
            "claim": claim,
            "docs": docs,
            "answers": answers,
            "judged": judged,
            "final": final,
        }  # :249-255

    # -- fever_multi_agent.py:260-273 --
    def load_claims_from_jsonl(self, filepath: str, limit: int = 5) -> list[dict]:
        out = []
        with open(filepath, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i >= limit:
                    break
                data = json.loads(line)
                out.append(
                    {
                        "id": data.get("id"),
                        "claim": data.get("claim"),
                        "label": data.get("label"),
                    }
                )
        return out

    # -- fever_multi_agent.py:275-296 --
    def evaluate_predictions(self, results: list[dict]) -> float:
        if not results:
            return 0.0
        correct = sum(
            1
            for r in results
            if r.get("label")
            and r["label"].upper() in str(r.get("final", "")).upper()
        )
        return correct / len(results)

    # -- test_connection.py:24-72 --
    def test_connection(self) -> bool:
        if not table_exists(self.spark, "documents"):
            from vector_db_setup_spark.sources.registry import register_views

            register_views(self.spark, self.sf_dir)
        docs = load_table(self.spark, self.sf_dir, "documents")
        n = docs.count()  # :50 COUNT(*)
        sample = docs.orderBy("doc_id").limit(3).collect()  # :55-59
        return n > 0 and len(sample) > 0

    # -- test_connection.py:74-118 --
    def test_vector_search(self, k: int = 5) -> bool:
        from vector_db_setup_spark.functions.vector import random_vector

        embs = load_table(self.spark, self.sf_dir, "embeddings")
        scored = embs.withColumn(
            "distance",
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        F.col("embedding").cast("array<double>"),
                        random_vector(self.dim),  # :86 np.random.rand
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
        )
        rows = scored.orderBy("distance").limit(k).collect()  # :89-97
        dists = [r["distance"] for r in rows]
        return len(rows) == k and all(
            d >= 0 and dists[i] <= dists[i + 1] for i, d in enumerate(dists[:-1])
        )
