#!/usr/bin/env python3
"""Runnable end-to-end CURATION-CHURN loop for the r10 surfaces: a
corpus that is not append-only — every day some documents are
REWRITTEN (quality fixes, re-embedding) while new ones land — kept
consistent with its derived state through MERGE commits that the
maintenance loop consumes O(batch).

    python3 examples/run_curation_churn.py [sf_dir]

Flow:

  documents+embeddings ─> land as ONE snapshot table (clustered,
                  per-file stats on the key)
  subscribers ──> SIX maintained states bootstrapped from the head:
                  agg view (per-lang counts), IVF vector index, LSH
                  near-dup index, span occurrence index, bigram LM,
                  and the DSIR raw-pool distribution
  day N ────────> merge_snapshot: rewrites a slice of old docs (new
                  text AND new embedding) and inserts fresh ones —
                  ONE O(batch) commit (batch dir + seq-scoped
                  tombstone; no prior bytes move); a delete commit
                  retires a few keys
  maintenance ──> maintenance_cycle: drains both subscribers off the
                  PAIR-ENCODED carry feed (each rewritten key arrives
                  as removed(pre-image)+added(post-image) — the agg
                  subtracts/adds, the IVF lands ONE
                  merge_into_ivf_index commit re-assigning the new
                  vectors), then compact_if, a commit-log checkpoint,
                  and retention GC under the subscriber cursors
  verify ───────> agg == a fresh groupBy of the head; the index ==
                  a fresh assignment of the head under the SAME
                  centroids; a pinned pre-churn version still reads

Every stage prints what it verified; the final marker line is the
success contract tests/test_examples.py asserts on.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from functools import partial

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
from pyspark.sql import functions as F

from vector_db_setup_spark.operators.ann import ivf_assign
from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.registry import load_table
from vector_db_setup_spark.sources.snapshot_table import (
    committed_versions,
    delete_from_snapshot,
    merge_snapshot,
    read_snapshot,
    snapshot_info,
    write_snapshot,
)
from vector_db_setup_spark.operators.dedup import (
    lsh_pairs_from_index,
    minhash_lsh_candidates,
)
from vector_db_setup_spark.operators.span_dedup import (
    duplicate_spans,
    spans_against_index,
)
from vector_db_setup_spark.operators.dsir import (
    bucket_totals,
    dsir_resample,
)
from vector_db_setup_spark.operators.ngram_lm import (
    lm_counts,
    perplexity_against_lm,
)
from vector_db_setup_spark.streaming.commit_log import (
    maintain_agg_from_commits,
    maintain_ivf_from_commits,
    maintain_dsir_from_commits,
    maintain_lm_from_commits,
    maintain_lsh_index_from_commits,
    maintain_span_index_from_commits,
    maintenance_cycle,
)


def main(sf_dir: str) -> None:
    spark = get_spark(
        app_name="curation-churn-example",
        master="local[4]",
        shuffle_partitions=4,
    )
    root = tempfile.mkdtemp(prefix="curation_churn_")
    base = f"{root}/corpus"
    agg_state, idx = f"{root}/agg", f"{root}/idx"
    lsh = f"{root}/lsh"
    spidx = f"{root}/spans"
    lm = f"{root}/lm"
    dsir_state = f"{root}/dsir"
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        )
        emb = load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        corpus = docs.join(emb, "doc_id", "inner")
        write_snapshot(
            corpus, base, stats_cols=["doc_id"], cluster_by=["doc_id"]
        )
        n0 = read_snapshot(spark, base).count()
        print(f"landed corpus: {n0} docs (clustered, stats on doc_id)")

        drains = [
            partial(
                maintain_agg_from_commits,
                spark, base, agg_state, f"{root}/ck_agg",
                group_col="lang", key_col="doc_id", sum_col=None,
            ),
            partial(
                maintain_ivf_from_commits,
                spark, base, idx, f"{root}/ck_ivf",
                key_col="doc_id", k=4, seed=7,
            ),
            partial(
                maintain_lsh_index_from_commits,
                spark, base, lsh, f"{root}/ck_lsh",
                text_col="text", key_col="doc_id",
                bands=4, num_hashes=8, shingle_n=3,
            ),
            partial(
                maintain_span_index_from_commits,
                spark, base, spidx, f"{root}/ck_spans",
                text_col="text", key_col="doc_id", shingle_n=8,
            ),
            partial(
                maintain_lm_from_commits,
                spark, base, lm, f"{root}/ck_lm",
                text_col="text", key_col="doc_id",
            ),
            partial(
                maintain_dsir_from_commits,
                spark, base, dsir_state, f"{root}/ck_dsir",
                text_col="text", key_col="doc_id", n_buckets=64,
            ),
        ]
        for d in drains:
            d()
        print(
            "subscribers bootstrapped: agg view + IVF index + LSH "
            "dedup index + span occurrence index + bigram LM + "
            "DSIR raw-pool distribution"
        )

        # ---- the churn day: rewrite a slice (new text AND embedding),
        # insert fresh docs — one MERGE commit; retire a few keys
        head = read_snapshot(spark, base)
        rewrite = (
            head.filter(F.col("doc_id") % 10 == 3)
            .select(
                "doc_id",
                F.concat(F.col("text"), F.lit(" [revised]")).alias("text"),
                F.lit("rev").alias("lang"),
                F.transform("embedding", lambda x: x * F.lit(0.5))
                .cast("array<float>")
                .alias("embedding"),
            )
        )
        fresh = head.orderBy(F.col("doc_id").desc()).limit(5).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.col("text"), F.col("lang"), F.col("embedding"),
        )
        v_merge = merge_snapshot(
            rewrite.unionByName(fresh), base, key_col="doc_id"
        )
        mi = snapshot_info(spark, base, v_merge)
        print(
            f"merge commit v{v_merge}: {mi['rows']} rows visible, "
            f"{len(mi['data'])} dirs + {len(mi['deletes'])} scoped "
            "tombstone (no prior bytes rewritten)"
        )
        delete_from_snapshot(
            read_snapshot(spark, base)
            .orderBy("doc_id").limit(3).select("doc_id"),
            base, key_col="doc_id",
        )
        print("delete commit: 3 keys retired")

        # ---- one maintenance pass consumes the whole day O(batch);
        # the six independent drains overlap on a thread pool (r12)
        # while sharing ONE pair-CDC assembly through the cycle cache
        report = maintenance_cycle(
            spark, base,
            drains=drains,
            subscriber_states=[agg_state, idx, lsh, spidx, lm, dsir_state],
            compact=dict(max_data_dirs=8, max_delete_entries=4),
            # the index-shaped states take delete+merge commits per
            # drain; the loop absorbs their merge-on-read debt too
            compact_subscribers=dict(max_data_dirs=8, max_delete_entries=4),
            gc=dict(keep=2, orphan_min_age_s=0),
            parallel_drains=6,
        )
        print(f"maintenance_cycle: {report}")
        # r12: the drain loop runs under the cycle feed cache — the
        # day's six subscriber drains must share ONE pair-CDC assembly
        # per key column over the same commits (IVF subscribes on the
        # same doc_id key here), not re-derive it per kind
        assert report["feed_assemblies"] + report["feed_cover_hits"] <= 2, report
        assert report["feed_fallbacks"] == 0, report
        print(
            f"shared CDC feed: {report['feed_requests']} subscriber "
            f"feeds served by {report['feed_assemblies']} assembly(ies)"
        )

        # ---- verification: both subscribers equal a from-scratch view
        agg_got = {
            (r["lang"], r["cnt"])
            for r in read_snapshot(spark, agg_state).collect()
        }
        agg_want = {
            (r["lang"], r["cnt"])
            for r in read_snapshot(spark, base)
            .groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert agg_got == agg_want, "agg view != rebuilt groupBy"
        print(f"agg view == rebuilt groupBy ({len(agg_got)} langs)")

        meta = snapshot_info(
            spark, idx, max(committed_versions(spark, idx))
        )["meta"]
        cents = np.asarray(meta["centroids"], dtype=np.float64)
        got = {
            (r["doc_id"], r["cluster_id"])
            for r in read_snapshot(spark, idx).collect()
        }
        want = {
            (r["doc_id"], r["cluster_id"])
            for r in ivf_assign(
                read_snapshot(spark, base).select("doc_id", "embedding"),
                cents, vec_col="embedding",
            ).collect()
        }
        assert got == want, "index != fresh assignment of the head"
        print(
            f"IVF index == fresh head assignment ({len(got)} vectors; "
            f"drift_ratio={meta.get('drift_ratio')})"
        )
        pairs_got = {
            (r["id_a"], r["id_b"])
            for r in lsh_pairs_from_index(
                read_snapshot(spark, lsh)
            ).collect()
        }
        pairs_want = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_candidates(
                read_snapshot(spark, base), "text", "doc_id",
                bands=4, num_hashes=8, shingle_n=3,
            ).collect()
        }
        assert pairs_got == pairs_want, "LSH index pairs != batch op"
        print(
            f"LSH dedup index == batch operator ({len(pairs_got)} "
            "candidate pairs; signatures computed only for the delta)"
        )
        spans_got = sorted(
            tuple(r)
            for r in spans_against_index(
                read_snapshot(spark, base).select("doc_id", "text"),
                read_snapshot(spark, spidx),
                n=8,
            ).collect()
        )
        spans_want = sorted(
            tuple(r)
            for r in duplicate_spans(
                read_snapshot(spark, base).select("doc_id", "text"), n=8
            ).collect()
        )
        assert spans_got == spans_want, "span index spans != batch op"
        print(
            f"span occurrence index == batch operator ({len(spans_got)} "
            "duplicated spans; shingled only for the delta)"
        )
        lm_got = {
            tuple(r) for r in read_snapshot(spark, lm).collect()
        }
        lm_want = {
            tuple(r)
            for r in lm_counts(
                read_snapshot(spark, base).select("doc_id", "text")
            ).collect()
        }
        assert lm_got == lm_want, "maintained LM != scratch counts"
        ppl_sample = perplexity_against_lm(
            read_snapshot(spark, base).select("doc_id", "text").limit(50),
            read_snapshot(spark, lm),
        ).count()
        print(
            f"bigram LM == scratch counts ({len(lm_got)} grams); "
            f"scored {ppl_sample} docs against the maintained state"
        )
        dsir_got = {
            tuple(r) for r in read_snapshot(spark, dsir_state).collect()
        }
        dsir_want = {
            tuple(r)
            for r in bucket_totals(
                read_snapshot(spark, base).select("doc_id", "text"),
                n_buckets=64,
            ).collect()
        }
        assert dsir_got == dsir_want, "maintained DSIR != scratch totals"
        sel = dsir_resample(
            read_snapshot(spark, base).select("doc_id", "text"),
            read_snapshot(spark, base)
            .select("doc_id", "text").limit(20),
            k=10, n_buckets=64,
        ).count()
        print(
            f"DSIR raw-pool distribution == scratch totals "
            f"({len(dsir_got)} buckets); resampled {sel} docs"
        )
        print("OK — curation churn loop (merge/delete/drain/verify)")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
