"""Set-oriented FEVER fact-verification pipeline (SURVEY.md §3.1 restated).

Reference flow (fever_multi_agent.py:222-255): per claim, sequentially —
retrieve top-k docs (KNN) → 3 LLM answers (styles precise/balanced/
creative, :235-239) → judge (majority vote, :166-176, or LLM) → editor
rewrite (:202-217) → substring-accuracy eval (:275-296).

Spark restatement: claims are ROWS, styles are an exploded column, every
stage is a DataFrame transform — the per-claim loop and the 3 sequential
LLM calls become data parallelism. The LLM stages are isolated behind
deterministic stand-ins (md5-derived labels) so the whole pipeline is
reproducible and DuckDB-oracle-checkable; a real model adapter would
replace `_det_label` with a `mapInPandas` batched-HTTP stage without
touching the pipeline shape (same contract as U2-U4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_db_setup_spark.functions.vector import l2_distance
from vector_db_setup_spark.sources.registry import load_table

LABELS = ("SUPPORTS", "REFUTES", "NOT ENOUGH INFO")
STYLES = ("precise", "balanced", "creative")


def _det_label(seed_col) -> F.Column:
    """Deterministic stand-in for an LLM classification: md5 first hex
    char mod 3 → a FEVER label. Identical in the DuckDB oracle."""
    idx = (
        F.conv(F.substring(F.md5(F.encode(seed_col, "UTF-8")), 1, 1), 16, 10)
        .cast("int")
        % 3
    )
    return (
        F.when(idx == 0, LABELS[0])
        .when(idx == 1, LABELS[1])
        .otherwise(F.lit(LABELS[2]))
    )


def make_claims(spark: SparkSession, sf_dir: str, n: int = 5) -> DataFrame:
    """Claims fixture from the documents table: first n docs become
    claims; ground-truth label derived deterministically from the text
    (stands in for the JSONL `label` field)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < n)
    return d.select(
        F.col("doc_id").alias("claim_id"),
        F.col("text").alias("claim"),
        _det_label(F.col("text")).alias("label"),
    )


def retrieve(
    claims: DataFrame, spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Batch KNN retrieval: claims (broadcast) × corpus, top-k docs per
    claim by L2 over the claim's own embedding (claims derived from docs
    share the docs' embedding space)."""
    # embeddings carries its own `label` (cluster id) — project it away
    # before joining so it can't shadow the claims' FEVER label
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )
    qv = claims.join(emb, claims.claim_id == emb.vec_id).select(
        "claim_id", "claim", "label", F.col("embedding").alias("qvec")
    )
    pairs = corpus.crossJoin(F.broadcast(qv))
    scored = pairs.withColumn("dist", l2_distance(F.col("embedding"), F.col("qvec")))
    w = Window.partitionBy("claim_id").orderBy(F.col("dist").asc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("claim_id", "claim", "label", "doc_id", "text", "rn")
    )


def gather_docs(retrieved: DataFrame) -> DataFrame:
    """Per-claim ordered doc list — the '[Doc i] …' context block the
    reference builds at fever_multi_agent.py:126."""
    return retrieved.groupBy("claim_id", "claim", "label").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rn"), F.col("doc_id")))
                ),
                lambda s: F.concat(
                    F.lit("[Doc "), s["rn"].cast("string"), F.lit("] doc:"),
                    s["doc_id"].cast("string"),
                ),
            ),
            "\n\n",
        ).alias("context"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def answerers(gathered: DataFrame) -> DataFrame:
    """3-style answer fan-out (reference U2): styles become an exploded
    column; the 'LLM' is the deterministic stand-in keyed on
    claim ⊕ style ⊕ context."""
    styled = gathered.select(
        "claim_id",
        "claim",
        "label",
        "context",
        F.explode(F.array(*[F.lit(s) for s in STYLES])).alias("style"),
    )
    return styled.withColumn(
        "answer",
        _det_label(F.concat_ws("|", F.col("claim"), F.col("style"), F.col("context"))),
    )


def judge_vote(answers: DataFrame) -> DataFrame:
    """Majority vote over the 3 answers (reference A2/U3 `voting` mode:
    max(set(labels), key=labels.count)); ties broken by count desc then
    label asc for determinism."""
    counted = answers.groupBy("claim_id", "claim", "label", "answer").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("claim_id").orderBy(
        F.col("c").desc(), F.col("answer").asc()
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("claim_id", "claim", "label", F.col("answer").alias("judged"))
    )


def editor(judged: DataFrame, strength: str = "light") -> DataFrame:
    """Deterministic editor stage (reference U4): formats the verdict;
    'strong' uppercases the whole statement."""
    base = F.concat(F.lit("Verdict: "), F.col("judged"))
    final = F.upper(base) if strength == "strong" else base
    return judged.withColumn("final", final)


def evaluate(results: DataFrame) -> DataFrame:
    """Substring-match accuracy (reference A3, fever_multi_agent.py:285):
    correct ⇔ ground-truth label is a substring of the uppercased
    prediction."""
    hit = F.when(
        F.instr(F.upper("final"), F.upper("label")) > 0, 1.0
    ).otherwise(0.0)
    return results.agg(
        F.round(F.avg(hit), 6).alias("accuracy"), F.count(F.lit(1)).alias("total")
    )


def fever_pipeline(
    spark: SparkSession, sf_dir: str, n_claims: int = 5, k: int = 3
) -> DataFrame:
    """Full chain: claims → retrieve → gather → answer ×3 → vote → edit.
    One declarative plan; Catalyst pipelines the stages (no per-claim
    loop, no sequential fan-out)."""
    claims = make_claims(spark, sf_dir, n_claims)
    retrieved = retrieve(claims, spark, sf_dir, k)
    gathered = gather_docs(retrieved)
    answers = answerers(gathered)
    judged = judge_vote(answers)
    return editor(judged)


def results_records(
    spark: SparkSession, sf_dir: str, n_claims: int = 5, k: int = 3
) -> DataFrame:
    """Reference-shaped nested result records (fever_results.json /
    fever_multi_agent.py:249-255,329): one row per claim with `docs`
    (ordered retrieved texts), `answers` (3 per-style), `judged`,
    `final`, `label`. Feed to sources/jsonl.write_results_single_file
    for the golden-file format."""
    claims = make_claims(spark, sf_dir, n_claims)
    retrieved = retrieve(claims, spark, sf_dir, k)
    docs = retrieved.groupBy("claim_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "text"))),
            lambda s: s["text"],
        ).alias("docs")
    )
    gathered = gather_docs(retrieved)
    answers = answerers(gathered)
    ans_arr = answers.groupBy("claim_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("style", "answer"))),
            lambda s: s["answer"],
        ).alias("answers")
    )
    judged = editor(judge_vote(answers))
    return (
        judged.join(docs, "claim_id")
        .join(ans_arr, "claim_id")
        .select("claim_id", "claim", "docs", "answers", "judged", "final", "label")
    )
