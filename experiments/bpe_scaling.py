"""BPE training cost: decoupled from corpus size after the one
word-frequency scan — the claim `operators/bpe.py` stands on.

The fixture corpus is degenerate for tokenizer work (31 distinct
words), so this experiment trains on a synthetic Zipf corpus with a
realistic shape: ~20k-word vocabulary, 100-token docs. Two corpus
sizes (5k and 200k docs — 40x) share the same vocabulary, so their
word-frequency tables have the SAME row count and per-merge cost
should be flat while only the one-time scan grows.

Also reports ms/merge over 100 merges (each merge = one pair-count
aggregate + one fold map + one 1-row collect) and the achieved
compression on a holdout slice.

Run:  python experiments/bpe_scaling.py   (~4 min on local[32])
Results recorded in SCALE_EXPERIMENTS.md "BPE training".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from vector_db_setup_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    word_freq_table,
)
from vector_db_setup_spark.session import get_spark

VOCAB = 20_000
DOC_LEN = 100
N_MERGES = 100


def corpus(spark, n_docs: int, start: int = 0):
    """Zipf-ish: token id = xxhash64 mod (rank band); realistic skew by
    mixing three bands (head/torso/tail). `start` offsets the id range
    so a holdout draws DIFFERENT texts (text is a pure function of the
    row id) from the same distribution."""
    h = lambda i, salt: F.abs(F.xxhash64(F.col("id"), F.lit(salt), i))  # noqa: E731
    word = lambda i: F.concat(  # noqa: E731
        F.lit("w"),
        F.when(h(i, 1) % 10 < 5, h(i, 2) % 100)  # 50% from top-100
        .when(h(i, 1) % 10 < 8, h(i, 3) % 2000)  # 30% from top-2k
        .otherwise(h(i, 4) % VOCAB)  # 20% anywhere
        .cast("string"),
    )
    return spark.range(start, start + n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.transform(F.sequence(F.lit(1), F.lit(DOC_LEN)), word)
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark(app_name="bpe-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for n_docs in (5_000, 200_000):
        c = corpus(spark, n_docs).persist()
        c.count()
        t = time.time()
        wf = word_freq_table(c).persist()
        n_words = wf.count()
        scan_s = time.time() - t
        t = time.time()
        merges = bpe_train(wf, N_MERGES)
        train_s = time.time() - t
        results[n_docs] = (n_words, scan_s, train_s, merges)
        print(
            f"{n_docs:>7} docs: {n_words} distinct words; scan {scan_s:.2f}s; "
            f"{len(merges)} merges in {train_s:.1f}s "
            f"({1000*train_s/len(merges):.0f} ms/merge)"
        )
        wf.unpersist(), c.unpersist()

    # batched rounds: same 100 merges, k disjoint merges per round
    c = corpus(spark, 200_000).persist()
    wf = word_freq_table(c).persist()
    wf.count()
    for k in (1, 8):
        t = time.time()
        m = bpe_train(wf, N_MERGES, merges_per_round=k)
        print(
            f"batched k={k}: {len(m)} merges in {time.time()-t:.1f}s"
        )
        if k == 1:
            seq = m
        else:
            overlap = len(set(m) & set(seq)) / len(seq)
            print(f"  merge-set overlap with sequential: {overlap:.0%}")
    wf.unpersist(), c.unpersist()

    # same vocab shape -> the learned tokenizer should compress a
    # TRUE holdout (disjoint id range => different texts from the same
    # distribution) similarly regardless of which corpus trained it
    hold = corpus(spark, 500, start=10_000_000).persist()
    chars = hold.select(
        F.sum(F.length(F.regexp_replace(F.lower("text"), r"\s+", "")))
    ).collect()[0][0]
    for n_docs, (_, _, _, merges) in results.items():
        toks = (
            bpe_encode(hold, merges)
            .select(F.sum(F.size("bpe_tokens")))
            .collect()[0][0]
        )
        print(
            f"holdout compression (trained on {n_docs}): "
            f"{chars} chars -> {toks} tokens ({chars/toks:.2f} chars/token)"
        )


if __name__ == "__main__":
    main()
