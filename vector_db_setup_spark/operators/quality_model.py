"""Model-based quality scoring — the fasttext-style LEARNED filter
that sits beside the heuristic one (functions/text.quality_score).

The modern curation recipe (C4 uses heuristics; CCNet/LLaMA-style
pipelines add a learned classifier) distills a cheap-to-evaluate
model from weak labels: here the heuristic score's top/bottom
quantiles label docs keep/drop, a hashed bag-of-words featurizer
(MLlib HashingTF — the same hashing trick as queries.hashed_bow,
murmur3 instead of md5 because MLlib vectors want it) feeds a seeded
logistic regression, and scoring is a pure map stage over the corpus.
The model then generalizes beyond the heuristic: it scores documents
BY CONTENT (which words appear), not by the three surface statistics
the heuristic sees — the learned filter's entire value at 100 TB is
exactly that transfer.

Scale shape: featurize = one tokenize + fixed-width hash per doc (no
vocabulary pass, no broadcast); training = MLlib LBFGS over the
(small, sampled) labeled slice; scoring = codegen-adjacent vectorized
map (MLlib transform), one pass over the corpus, zero shuffles.
Everything is DataFrame-native; the model is a plain MLlib
PipelineModel (save/load = the standard artifact story).

Rows-only by nature (LBFGS float reductions are not bit-reproducible
across partitionings, and murmur3 hashing differs from any SQL
oracle); the invariant tests pin what matters — scores in [0,1],
separation (mean score of weak-keep docs far above weak-drop), and
agreement with the weak labels well above chance on held-out docs.

Reference scope: the reference has no quality filtering at all; this
extends the curation stack (SURVEY §2 LLM-pipeline extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_setup_spark.functions.text import quality_score


def weak_labels(
    docs: DataFrame,
    text_col: str = "text",
    keep_quantile: float = 0.7,
    drop_quantile: float = 0.3,
) -> DataFrame:
    """Distillation labels from the heuristic: docs above the
    keep-quantile of quality_score get label 1, below the
    drop-quantile get 0, the ambiguous middle band is EXCLUDED (the
    standard distillation trick — train only where the teacher is
    confident). Returns (all original columns, label).

    The thresholds come from ``approx_percentile`` (Spark's
    Greenwald-Khanna / QuantileSummaries sketch, accuracy 10000 ≈
    0.01% rank error), NOT exact ``percentile``:
    exact percentile buffers every value of the group in ONE
    aggregation buffer, so the final merge materializes ~every
    distinct quality score on a single reducer — OOM at corpus scale,
    and this runs in a PIPELINE stage, not a profiling query. The
    labels are weak by construction (the teacher is a three-feature
    heuristic); sub-0.1%-rank threshold jitter moves only docs whose
    keep/drop call was arbitrary anyway, and the invariant tests pin
    separation/agreement, not the exact cutoff."""
    if "_q" in docs.columns or "label" in docs.columns:
        # withColumn would silently overwrite the caller's column (and
        # the tail drop() remove _q from the result) — r13 review pass
        raise ValueError(
            "weak_labels reserves column names ['_q', 'label']; "
            "rename them on the input first"
        )
    scored = docs.withColumn("_q", quality_score(text_col))
    hi, lo = scored.select(
        F.expr(f"approx_percentile(_q, {keep_quantile}, 10000)"),
        F.expr(f"approx_percentile(_q, {drop_quantile}, 10000)"),
    ).first()
    return (
        scored.filter((F.col("_q") >= hi) | (F.col("_q") <= lo))
        .withColumn(
            "label", F.when(F.col("_q") >= hi, 1.0).otherwise(0.0)
        )
        .drop("_q")
    )


def build_quality_pipeline(
    text_col: str = "text", n_features: int = 1024, seed: int = 42
):
    """Tokenize -> HashingTF (fixed-width, vocabulary-free) -> seeded
    logistic regression, as an MLlib Pipeline."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_words", pattern=r"\s+"
    )
    tf = HashingTF(
        inputCol="_words", outputCol="features", numFeatures=n_features
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=30,
        regParam=0.01,
    )
    # LR has no seed param (LBFGS is deterministic up to float
    # reduction order); `seed` reserved for future sampled variants
    _ = seed
    return Pipeline(stages=[tok, tf, lr])


def train_quality_model(
    docs: DataFrame,
    text_col: str = "text",
    n_features: int = 1024,
    model_dir: str | None = None,
):
    """Fit the distilled quality classifier on weak labels. Returns
    the fitted PipelineModel, round-tripped through save()/load()
    (into ``model_dir`` when given, else a temp dir).

    The round-trip is LOAD-BEARING, not ceremony: a freshly-fit
    LogisticRegressionModel carries its trainingSummary, which holds
    the live SparkSession — and the transform UDF's closure serializes
    the MODEL, so scoring tasks drag the session along. That is
    invisible until the session has any driver-only state a closure
    can't ship (one `df.observe` anywhere populates
    ObservationManager), at which point every transform dies with
    'Task not serializable'. Persisted models don't keep summaries,
    so the loaded model is exactly the deployable artifact — which is
    also the production path (train offline, ship the directory)."""
    import shutil
    import tempfile

    labeled = weak_labels(docs, text_col)
    fitted = build_quality_pipeline(text_col, n_features).fit(labeled)
    from pyspark.ml import PipelineModel

    if model_dir is not None:
        fitted.write().overwrite().save(model_dir)
        return PipelineModel.load(model_dir)
    # throwaway round-trip dir: the loaded model holds everything in
    # memory, so clean up immediately (repeated training would
    # otherwise accumulate /tmp model dirs indefinitely)
    tmp = tempfile.mkdtemp(prefix="quality_model_")
    try:
        fitted.write().overwrite().save(tmp)
        return PipelineModel.load(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def score_quality(
    model, docs: DataFrame, text_col: str = "text", out_col: str = "p_keep"
) -> DataFrame:
    """P(keep) per document — a pure map stage (tokenize + hash +
    dot-product), no shuffle, no vocabulary broadcast."""
    import pyspark.ml.functions as MF

    scored = model.transform(docs)
    return scored.withColumn(
        out_col, MF.vector_to_array(F.col("probability")).getItem(1)
    ).drop("_words", "features", "rawPrediction", "probability", "prediction")
