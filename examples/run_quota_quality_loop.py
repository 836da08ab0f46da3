#!/usr/bin/env python3
"""Runnable end-to-end walkthrough of the r11 curation surfaces: the
per-source quota family (batch cap + online admission), the
quality-ranked dedup keeper policy, and the maintained perplexity
histogram — composed the way a training-data pipeline runs them.

    python3 examples/run_quota_quality_loop.py [sf_dir]

Flow:

  documents ──────> source_caps (batch: seeded md5-rank, membership-
                    checksummed) + the kept-rows form (rank <= cap,
                    which must compile to WindowGroupLimit)
  doc stream ─────> quota_admission_stream (online per-source quota,
                    one admitted-count long per key)
  dedup graph ────> dedup_keepers_by_quality vs dedup_keepers: the
                    quality policy must never keep a SMALLER copy than
                    the min-id policy within any cluster
  corpus snapshot > frozen bigram LM + maintain_ppl_histogram_from_
                    commits: bootstrap, append a delta, drain, derive
                    cut points from the <=n_bins state, bucket the
                    corpus with literal thresholds — and the cuts must
                    sit within one bin width of the exact percentile

Every stage prints what it verified; the final marker line is the
success contract tests/test_examples.py asserts on.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_db_setup_spark import queries as q
from vector_db_setup_spark.operators.ngram_lm import (
    bucket_by_thresholds,
    lm_counts,
    perplexity_against_lm,
    quantiles_from_histogram,
)
from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.registry import load_table
from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    read_snapshot,
    write_snapshot,
)
from vector_db_setup_spark.streaming.commit_log import (
    maintain_ppl_histogram_from_commits,
)
from vector_db_setup_spark.streaming.events import quota_admission_stream

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
CAP = 10


def main() -> None:
    spark = get_spark(app_name="quota-quality-loop")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    # 1. batch cap: summary + the WindowGroupLimit kept-rows form
    summary = {r["source"]: r for r in q.source_caps(spark, SF_DIR).collect()}
    assert all(
        r["n_kept"] == min(CAP, r["n_docs"]) for r in summary.values()
    ), "cap arithmetic broke"
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("-cap"))),
            F.col("doc_id"),
        )
    )
    kept = (
        docs.select("source", "doc_id", rk.alias("rk")).filter(f"rk <= {CAP}")
    )
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, "kept-rows form lost its group limit"
    n_kept = kept.count()
    assert n_kept == sum(r["n_kept"] for r in summary.values())
    print(
        f"source_caps: {len(summary)} sources, {n_kept} kept at cap {CAP}; "
        "kept-rows plan has WindowGroupLimit"
    )

    # 2. online quota over a document stream (arrival-order admission)
    with tempfile.TemporaryDirectory(prefix="quota_stream_") as tmp:
        src = f"{tmp}/docs"
        docs.select("doc_id", "source").write.parquet(src)
        stream = spark.readStream.schema("doc_id long, source string").parquet(
            src
        )
        qy = (
            quota_admission_stream(stream, cap=CAP)
            .writeStream.format("memory")
            .queryName("quota_loop")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        qy.awaitTermination()
        admitted = spark.table("quota_loop").groupBy("source").count().collect()
        assert all(r["count"] <= CAP for r in admitted)
        print(
            f"quota_admission_stream: {sum(r['count'] for r in admitted)} "
            f"admitted across {len(admitted)} sources, all <= cap"
        )

    # 3. quality keepers never keep a smaller copy than min-id keepers
    by_q = {
        r["doc_id"]: r["keeper_id"]
        for r in q.dedup_keepers_by_quality(spark, SF_DIR).collect()
    }
    by_id = {
        r["doc_id"]: r["keeper_id"]
        for r in q.dedup_keepers(spark, SF_DIR).collect()
    }
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in docs.select("doc_id", "n_chars").collect()
    }
    diff = [d for d in by_q if by_q[d] != by_id[d]]
    assert all(chars[by_q[d]] >= chars[by_id[d]] for d in by_q)
    print(
        f"dedup keepers: quality policy differs from min-id in {len(diff)} "
        "of "
        f"{len(by_q)} docs, and never keeps a smaller copy"
    )

    # 4. frozen LM + maintained perplexity histogram + literal buckets
    geo = dict(lo=0.0, hi=5000.0, n_bins=512)
    with tempfile.TemporaryDirectory(prefix="ppl_hist_") as tmp:
        corpus, lm, hist, ck = (
            f"{tmp}/corpus", f"{tmp}/lm", f"{tmp}/hist", f"{tmp}/ck",
        )
        ref = docs.filter("doc_id < 100").select("doc_id", "text")
        write_snapshot(lm_counts(ref), lm, meta={"kind": "bigram_lm"})
        head = docs.filter("doc_id >= 100 and doc_id < 400").select(
            "doc_id", "text"
        )
        write_snapshot(head, corpus)
        drain = lambda: maintain_ppl_histogram_from_commits(  # noqa: E731
            spark, corpus, lm, hist, ck, **geo,
        )
        drain()
        append_snapshot(
            docs.filter("doc_id >= 400").select("doc_id", "text"), corpus
        )
        drain()
        cuts = quantiles_from_histogram(
            read_snapshot(spark, hist), (1.0 / 3, 2.0 / 3), **geo
        )
        per = perplexity_against_lm(
            read_snapshot(spark, corpus), read_snapshot(spark, lm)
        )
        exact = per.agg(
            F.percentile("ppl", F.lit(1.0 / 3)),
            F.percentile("ppl", F.lit(2.0 / 3)),
        ).collect()[0]
        width = (geo["hi"] - geo["lo"]) / geo["n_bins"]
        assert all(
            abs(cuts[i] - float(exact[i])) <= width for i in range(2)
        ), (cuts, list(exact))
        buckets = {
            r["bucket"]: r["count"]
            for r in bucket_by_thresholds(per, cuts)
            .groupBy("bucket")
            .count()
            .collect()
        }
        print(
            f"maintained ppl histogram: cuts {cuts} within one bin width "
            f"({width:.2f}) of exact {[round(float(x), 3) for x in exact]}; "
            f"buckets {buckets}"
        )

    print("OK — quota/quality curation loop (cap/keepers/histogram/stream)")


if __name__ == "__main__":
    main()
