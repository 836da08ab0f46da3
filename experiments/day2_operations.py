"""Day-2 operations measured (r8): a sustained mixed-commit workload
against one snapshot table with the full maintenance loop attached —
the steady-state behavior a table actually lives in, not a
single-operation microbenchmark.

Workload: land 50k docs, then 30 commits (appends of 1k with stats +
clustering, periodic key deletes), draining the Bloom + COUNT/SUM
subscriptions and running threshold compaction (`compact_if`) every 10
commits, with a provenance tag pinned mid-history and age-floor GC at
the end. Reports per-phase walls and verifies at the end:

  - bloom state SUPERSET of rebuilt-from-scratch filter (removed
    keys linger by design — Bloom has no delete; conservative for
    decontamination) and no false negatives on live keys
  - agg state == rebuilt groupBy
  - tagged version readable after GC; newer-than-floor versions kept
  - head read wall before vs after the last compaction

Run:  python experiments/day2_operations.py
(~3 min on local[32]; deterministic.) Results recorded in
SCALE_EXPERIMENTS.md "Day-2 operations".
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from vector_db_setup_spark.operators.bloom import bloom_build
from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    compact_if,
    committed_versions,
    delete_from_snapshot,
    gc_snapshots,
    read_snapshot,
    tag_snapshot,
    write_snapshot,
)
from vector_db_setup_spark.streaming.commit_log import (
    maintain_agg_from_commits,
    maintain_bloom_from_commits,
)

NB, K = 1 << 20, 5


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
        (F.col("id") % 97 + 10).alias("n_tokens"),
    )


def sustained_merge_cycles(spark, root, n_cycles=50):
    """r10 (VERDICT r9 #8): ``maintenance_cycle`` driven through
    ``n_cycles`` of the FULL mixed workload — every cycle lands one
    append (500 rows), one merge (200 rewrites of old keys + 100
    inserts), and every 5th cycle a delete (50 keys) — with the agg
    subscriber draining pair-encoded merge increments, threshold
    compaction, commit-log checkpoints, and retention GC under the
    slowest-subscriber contract, all through the one entry point.

    The steady-state claims, measured per cycle and compared first-10
    vs last-10 (the corpus grows ~30k rows over the run):
      - drain wall stays FLAT (merge consumption is O(batch));
      - the drain's pruned-probe bytes (inputFiles of every
        read_snapshot the feed issues against the source) stay FLAT;
      - compact_if fires periodically and bounds the tombstone stack;
      - GC reclaims behind the subscriber cursor every cycle.
    End state: agg == rebuilt groupBy, exact."""
    import statistics
    from functools import partial

    import vector_db_setup_spark.sources.snapshot_table as st
    from vector_db_setup_spark.sources.snapshot_table import (
        merge_snapshot,
    )
    from vector_db_setup_spark.streaming.commit_log import (
        maintenance_cycle,
    )

    base = f"{root}/mix"
    agg_state = f"{root}/magg"
    kw = dict(stats_cols=["doc_id"], cluster_by=["doc_id"])
    write_snapshot(_docs(spark, 0, 50_000).repartition(8), base, **kw)

    drain = partial(
        maintain_agg_from_commits,
        spark, base, agg_state, f"{root}/ck_m",
        group_col="lang", key_col="doc_id", sum_col="n_tokens",
    )
    drain()  # bootstrap (O(corpus), once)

    real = st.read_snapshot
    probe_bytes = [0]

    def spy(spark_, base_, version=None, fs=None, key_between=None,
            key_in=None, tag=None):
        df = real(spark_, base_, version=version, fs=fs,
                  key_between=key_between, key_in=key_in, tag=tag)
        if base_ == base and (
            key_between is not None or key_in is not None
        ):
            probe_bytes[0] += sum(
                os.path.getsize(f.replace("file:", ""))
                for f in df.inputFiles()
            )
        return df

    nxt, m_lo = 50_000, 0
    drain_s, drain_mb = [], []
    compact_fires = 0
    gc_total = 0
    t_all = time.perf_counter()
    for cycle in range(n_cycles):
        append_snapshot(_docs(spark, nxt, nxt + 500), base, **kw)
        nxt += 500
        upd = _docs(spark, m_lo, m_lo + 200).withColumn(
            "n_tokens", F.col("n_tokens") + 1000
        ).union(_docs(spark, nxt, nxt + 100))
        merge_snapshot(upd, base, key_col="doc_id")
        nxt += 100
        m_lo += 200
        if cycle % 5 == 4:
            delete_from_snapshot(
                spark.range(nxt - 550, nxt - 500).select(
                    F.col("id").alias("doc_id")
                ),
                base, key_col="doc_id",
            )
        probe_bytes[0] = 0
        st.read_snapshot = spy
        t = time.perf_counter()
        try:
            report = maintenance_cycle(
                spark, base,
                drains=[drain],
                subscriber_states=[agg_state],
                compact=dict(
                    max_data_dirs=12, max_delete_entries=6,
                    target_file_bytes=256 << 10,
                ),
                gc=dict(keep=3, orphan_min_age_s=0),
            )
        finally:
            st.read_snapshot = real
        drain_s.append(time.perf_counter() - t)
        drain_mb.append(probe_bytes[0] / 1e6)
        if report.get("compacted_version"):
            compact_fires += 1
        gc_total += len(report["gc"]["removed"])
    total = time.perf_counter() - t_all
    med = statistics.median
    print(
        f"sustained_cycles          {n_cycles} cycles "
        f"({total:.1f}s total; corpus 50k -> {nxt:,} keys)"
    )
    print(
        f"cycle_wall_s              first10 {med(drain_s[:10]):6.3f}  "
        f"last10 {med(drain_s[-10:]):6.3f}   (drain+compact+ckpt+gc)"
    )
    print(
        f"drain_probe_MB            first10 {med(drain_mb[:10]):6.3f}  "
        f"last10 {med(drain_mb[-10:]):6.3f}   (pruned source reads per "
        "cycle)"
    )
    print(
        f"compact_if_fires          {compact_fires}   gc_removed "
        f"{gc_total} versions across the run"
    )
    agg_got = {
        tuple(r) for r in read_snapshot(spark, agg_state).collect()
    }
    agg_want = {
        tuple(r)
        for r in read_snapshot(spark, base)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_tokens").alias("total"),
        )
        .collect()
    }
    print(f"agg_state == rebuilt      {agg_got == agg_want}")
    print(
        f"versions_alive            "
        f"{len(committed_versions(spark, base))}"
    )



def _span_docs(spark, lo, hi, text_from_offset=0):
    """12 globally-unique tokens per doc; text_from_offset>0 makes the
    text an exact ECHO of the doc `offset` ids earlier (same passage,
    new doc_id — the duplicated-span shape)."""
    from pyspark.sql import functions as F

    src = F.col("id") - text_from_offset
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.md5((src * 12 + F.lit(j)).cast("string"))
                for j in range(12)
            ],
        ).alias("text"),
    )


def sustained_span_cycles(spark, root, n_cycles=30):
    """r10 second wave: the SPAN OCCURRENCE INDEX as a sustained
    subscriber. Every cycle appends 200 docs (20 exact echoes of
    old passages + 180 fresh), merges 50 content rewrites of old
    keys, every 5th cycle deletes 20 keys; the index drains through
    ``maintenance_cycle`` (drain -> compact_if -> checkpoint ->
    retention GC). Claims measured first-10 vs last-10 cycles while
    the index grows: drain wall FLAT (shingling is paid for the
    delta only). End state: index rows == a from-scratch shingling
    of the head, exact."""
    import statistics
    from functools import partial

    from vector_db_setup_spark.operators.span_dedup import (
        _POS_CAP,
        ngram_occurrences,
    )
    from vector_db_setup_spark.sources.snapshot_table import (
        merge_snapshot,
    )
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_span_index_from_commits,
        maintenance_cycle,
    )

    base = f"{root}/sspan"
    idx = f"{root}/sspan_idx"
    kw = dict(stats_cols=["doc_id"], cluster_by=["doc_id"])
    write_snapshot(_span_docs(spark, 0, 20_000).repartition(8), base, **kw)
    drain = partial(
        maintain_span_index_from_commits,
        spark, base, idx, f"{root}/ck_sspan",
        text_col="text", key_col="doc_id", shingle_n=8,
    )
    t = time.perf_counter()
    drain()  # bootstrap (O(corpus), once)
    boot_s = time.perf_counter() - t

    nxt, m_lo = 20_000, 0
    walls = []
    compact_fires = 0
    for cycle in range(n_cycles):
        echo = _span_docs(spark, nxt, nxt + 20, text_from_offset=nxt)
        fresh = _span_docs(spark, nxt + 20, nxt + 200)
        append_snapshot(echo.unionByName(fresh), base, **kw)
        nxt += 200
        merge_snapshot(
            _span_docs(spark, m_lo, m_lo + 50, text_from_offset=-123_456),
            base, key_col="doc_id",
        )
        m_lo += 50
        if cycle % 5 == 4:
            delete_from_snapshot(
                spark.range(nxt - 210, nxt - 190).select(
                    F.col("id").alias("doc_id")
                ),
                base, key_col="doc_id",
            )
        t = time.perf_counter()
        maintenance_cycle(
            spark, base,
            drains=[drain],
            subscriber_states=[idx],
            compact=dict(
                max_data_dirs=12, max_delete_entries=6,
                target_file_bytes=256 << 10,
            ),
            # the index takes delete+merge commits per drain — its
            # merge-on-read debt is the loop's to absorb (rewrite
            # drains no longer compact it accidentally via the
            # TombstonedKeyError heal)
            compact_subscribers=dict(
                max_data_dirs=12, max_delete_entries=6,
                target_file_bytes=256 << 10,
            ),
            gc=dict(keep=3, orphan_min_age_s=0),
        )
        walls.append(time.perf_counter() - t)
    med = statistics.median
    print(
        f"span_cycles               {n_cycles} cycles "
        f"(bootstrap {boot_s:.1f}s; corpus 20k -> {nxt:,} keys)"
    )
    print(
        f"span_cycle_wall_s         first10 {med(walls[:10]):6.3f}  "
        f"last10 {med(walls[-10:]):6.3f}   (drain+compact+ckpt+gc)"
    )
    head = read_snapshot(spark, base)
    got = {
        tuple(r)
        for r in read_snapshot(spark, idx)
        .select("occ_key", "doc_id", "pos", "gram")
        .collect()
    }
    want = {
        tuple(r)
        for r in ngram_occurrences(head, n=8)
        .select(
            (F.col("id").cast("long") * _POS_CAP + F.col("pos")).alias(
                "occ_key"
            ),
            F.col("id").alias("doc_id"),
            "pos",
            "gram",
        )
        .collect()
    }
    print(f"span_index == scratch     {got == want} ({len(got):,} rows)")


def sustained_hist_cycles(spark, root, n_cycles=12):
    """r11: the MAINTAINED PERPLEXITY HISTOGRAM as a sustained
    subscriber — the 7th maintainer kind composed through the same
    ``maintenance_cycle`` loop as its siblings. Every cycle appends
    200 docs (20 exact echoes of old passages + 180 fresh), merges 50
    content rewrites of old keys, every 5th cycle deletes 20 keys; the
    histogram drains against a FROZEN reference LM. Claims measured
    first-5 vs last-5 cycles while the corpus grows: drain wall FLAT
    (scoring is paid for the delta only; the state is <=n_bins rows).
    End state: histogram == a from-scratch score+bin of the head,
    exact bin for bin."""
    import statistics
    from functools import partial

    from vector_db_setup_spark.operators.ngram_lm import (
        lm_counts,
        perplexity_against_lm,
        ppl_histogram,
    )
    from vector_db_setup_spark.sources.snapshot_table import (
        merge_snapshot,
    )
    from vector_db_setup_spark.streaming.commit_log import (
        maintain_ppl_histogram_from_commits,
        maintenance_cycle,
    )

    base = f"{root}/shist"
    lm = f"{root}/shist_lm"
    hist = f"{root}/shist_state"
    # hi sized for THIS vocab: the synthetic docs' smoothed ppl sits
    # ~8k (LM-member passages) vs ~24k (unseen bigrams) — a 5k ceiling
    # would clamp both into the top bin and degenerate the check
    geo = dict(lo=0.0, hi=50_000.0, n_bins=1024)
    kw = dict(stats_cols=["doc_id"], cluster_by=["doc_id"])
    # frozen reference LM over a STATIC slice (CCNet's static-wiki-LM
    # shape) — the corpus under churn never touches it
    write_snapshot(
        lm_counts(_span_docs(spark, 0, 2_000)), lm,
        meta={"kind": "bigram_lm"},
    )
    write_snapshot(_span_docs(spark, 0, 20_000).repartition(8), base, **kw)
    drain = partial(
        maintain_ppl_histogram_from_commits,
        spark, base, lm, hist, f"{root}/ck_shist",
        text_col="text", key_col="doc_id", **geo,
    )
    t = time.perf_counter()
    drain()  # bootstrap (O(corpus), once)
    boot_s = time.perf_counter() - t

    nxt, m_lo = 20_000, 0
    walls = []
    for cycle in range(n_cycles):
        echo = _span_docs(spark, nxt, nxt + 20, text_from_offset=nxt)
        fresh = _span_docs(spark, nxt + 20, nxt + 200)
        append_snapshot(echo.unionByName(fresh), base, **kw)
        nxt += 200
        merge_snapshot(
            _span_docs(spark, m_lo, m_lo + 50, text_from_offset=-77_000),
            base, key_col="doc_id",
        )
        m_lo += 50
        if cycle % 5 == 4:
            delete_from_snapshot(
                spark.range(nxt - 210, nxt - 190).select(
                    F.col("id").alias("doc_id")
                ),
                base, key_col="doc_id",
            )
        t = time.perf_counter()
        maintenance_cycle(
            spark, base,
            drains=[drain],
            subscriber_states=[hist],
            compact=dict(
                max_data_dirs=12, max_delete_entries=6,
                target_file_bytes=256 << 10,
            ),
            compact_subscribers=dict(
                max_data_dirs=12, max_delete_entries=6,
                target_file_bytes=256 << 10,
            ),
            gc=dict(keep=3, orphan_min_age_s=0),
        )
        walls.append(time.perf_counter() - t)
    med = statistics.median
    print(
        f"hist_cycles               {n_cycles} cycles "
        f"(bootstrap {boot_s:.1f}s; corpus 20k -> {nxt:,} keys)"
    )
    print(
        f"hist_cycle_wall_s         first5 {med(walls[:5]):6.3f}  "
        f"last5 {med(walls[-5:]):6.3f}   (drain+compact+ckpt+gc)"
    )
    head = read_snapshot(spark, base)
    want = sorted(
        (int(r["bin"]), int(r["n"]))
        for r in ppl_histogram(
            perplexity_against_lm(head, read_snapshot(spark, lm)), **geo
        ).collect()
    )
    got = sorted(
        (int(r["bin"]), int(r["n"]))
        for r in read_snapshot(spark, hist).collect()
    )
    print(f"hist == scratch           {got == want} ({len(got)} bins)")




def main():
    spark = get_spark(
        app_name="day2-ops",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    root = "/tmp/day2_ops_exp"
    shutil.rmtree(root, ignore_errors=True)
    base = f"{root}/docs"
    bloom_state, agg_state = f"{root}/bloom", f"{root}/agg"
    kw = dict(stats_cols=["doc_id"], cluster_by=["doc_id"])

    t0 = time.perf_counter()
    write_snapshot(
        _docs(spark, 0, 50_000).repartition(8), base,
        checks={"doc_id_nonneg": "doc_id >= 0"}, **kw,
    )
    print(f"initial_land_50k_s        {time.perf_counter() - t0:7.3f}")

    def drain():
        t = time.perf_counter()
        maintain_bloom_from_commits(
            spark, base, "doc_id", bloom_state, f"{root}/ck_b",
            num_bits=NB, k=K,
        )
        tb = time.perf_counter() - t
        t = time.perf_counter()
        maintain_agg_from_commits(
            spark, base, agg_state, f"{root}/ck_a",
            group_col="lang", key_col="doc_id", sum_col="n_tokens",
        )
        return tb, time.perf_counter() - t

    tb, ta = drain()
    print(f"bootstrap_drains_s        {tb:7.3f} bloom  {ta:7.3f} agg")

    nxt = [50_000]
    n_commits = 0
    compactions = 0
    t_commits = t_drains = t_compacts = 0.0
    for round_i in range(3):
        for j in range(10):
            t = time.perf_counter()
            if j % 5 == 4:  # every 5th commit: a key-range delete
                lo = round_i * 400
                delete_from_snapshot(
                    spark.range(lo, lo + 200).select(
                        F.col("id").alias("doc_id")
                    ),
                    base,
                    key_col="doc_id",
                )
            else:
                append_snapshot(
                    _docs(spark, nxt[0], nxt[0] + 1_000), base, **kw
                )
                nxt[0] += 1_000
            t_commits += time.perf_counter() - t
            n_commits += 1
        if round_i == 1:
            tag_snapshot(spark, base, "train-mid", fs=None)
        tb, ta = drain()
        t_drains += tb + ta
        t = time.perf_counter()
        if compact_if(
            spark, base, max_data_dirs=8, max_delete_entries=3,
            target_file_bytes=256 << 10,
        ):
            compactions += 1
        t_compacts += time.perf_counter() - t
    print(f"mixed_commits_s           {t_commits:7.3f}  ({n_commits} commits, "
          f"{t_commits / n_commits:.3f} s each)")
    print(f"incremental_drains_s      {t_drains:7.3f}  (3 rounds x 2 maintainers)")
    print(f"compact_if_s              {t_compacts:7.3f}  ({compactions} fired)")

    # ---- end-state verification
    maintained = {
        r["idx"]: r["word"]
        for r in read_snapshot(spark, bloom_state).collect()
    }
    rebuilt = {
        r["idx"]: r["word"]
        for r in bloom_build(
            read_snapshot(spark, base).select("doc_id").distinct(),
            "doc_id", NB, K,
        ).collect()
    }
    # deletes linger in the filter (no Bloom delete): maintained must
    # SET every bit the rebuilt filter sets (no false negatives), and
    # may set more
    superset = all(
        idx in maintained and (maintained[idx] | w) == maintained[idx]
        for idx, w in rebuilt.items()
    )
    agg_got = {
        tuple(r) for r in read_snapshot(spark, agg_state).collect()
    }
    agg_want = {
        tuple(r)
        for r in read_snapshot(spark, base)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_tokens").alias("total"))
        .collect()
    }
    t = time.perf_counter()
    head_files = len(read_snapshot(spark, base).inputFiles())
    read_snapshot(spark, base).count()
    head_read_s = time.perf_counter() - t
    removed = gc_snapshots(
        spark, base, keep=2, orphan_min_age_s=0, keep_age_s=86400
    )
    tagged_ok = read_snapshot(spark, base, tag="train-mid").count()
    print(f"bloom_superset_of_rebuilt {superset} "
          f"(lingering delete bits: {len(maintained) - len(rebuilt)} words)")
    print(f"agg_state == rebuilt      {agg_got == agg_want}")
    print(f"head_read_s               {head_read_s:7.3f}  ({head_files} files)")
    print(f"gc_removed                {len(removed)} versions "
          f"(age floor kept the rest); tagged read: {tagged_ok} rows")
    print(f"versions_alive            {len(committed_versions(spark, base))}")
    print()
    sustained_merge_cycles(spark, root)
    print()
    sustained_span_cycles(spark, root)
    sustained_hist_cycles(spark, root)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
