"""Shared CDC feed assembly measured (r12, VERDICT r11 next-round #1):
what does one-assembly-per-cycle buy a 7-subscriber maintenance cycle?

The r11 ppl-histogram experiment measured the per-drain protocol fixed
cost at ~6-7 s at fixture scale — and a curation deployment drains ALL
subscriber kinds per cycle, so the cycle paid that cost once per kind
for the same source commits. streaming/feed_cache now assembles the
pair-CDC feed once per (source, key, version-range) per cycle and
derives each subscriber's narrower feed from the shared persisted
relation.

Setup: two IDENTICAL deployments (same deterministic data, separate
tables) with all seven doc-keyed subscriber kinds attached — Bloom,
COUNT/SUM agg, bigram LM, perplexity histogram (frozen reference LM),
DSIR bucket totals, LSH inverted index, span occurrence index. Each
cycle appends 200 docs and merges 30 content rewrites, then drains all
seven kinds through ``maintenance_cycle`` (drains only — compaction /
checkpoint / GC skipped to isolate the drain phase):

  - SHARED: the normal path (feed_cache.cycle active)
  - UNSHARED: feed_cache.cycle patched to a null cache, so every
    drain assembles its own narrow feed — the pre-r12 behavior

Variant order alternates per cycle to cancel JVM-warmth bias. Claims
measured: per-cycle drain wall shared vs unshared (median + ratio),
assemblies per cycle (1 vs 7), and end-state parity (agg == rebuilt
groupBy, LM == rebuilt counts) for BOTH variants — sharing must change
the cost, never the states.

After the A/B comparison, `sustained_full_loop` runs the REALISTIC
composition: 10 cycles of the full maintenance_cycle (shared feed +
compaction + checkpoint + retention GC) over all seven kinds — cycle
walls flat (compaction absorbs the merge-on-read debt the drains-only
variant deliberately let grow), one assembly per cycle, end states
equal from-scratch rebuilds.

Run:  python experiments/shared_feed_cycle.py
(~15-20 min on local[32]; deterministic.) Results recorded in
SCALE_EXPERIMENTS.md "Shared CDC feed assembly".
"""

from __future__ import annotations

import contextlib
import os
import statistics
import sys
import time
from functools import partial

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from vector_db_setup_spark.operators.ngram_lm import lm_counts
from vector_db_setup_spark.session import get_spark
from vector_db_setup_spark.sources.snapshot_table import (
    append_snapshot,
    merge_snapshot,
    read_snapshot,
    write_snapshot,
)
from vector_db_setup_spark.streaming import feed_cache
from vector_db_setup_spark.streaming.commit_log import (
    maintain_agg_from_commits,
    maintain_bloom_from_commits,
    maintain_dsir_from_commits,
    maintain_lm_from_commits,
    maintain_lsh_index_from_commits,
    maintain_ppl_histogram_from_commits,
    maintain_span_index_from_commits,
    maintenance_cycle,
)

N_DOCS = 8_000
N_CYCLES = 5
GEO = dict(lo=0.0, hi=50_000.0, n_bins=256)


def _docs(spark, lo, hi, text_from_offset=0):
    """Deterministic docs with text (8-word rolling passages), a group
    column and a summable value — every subscriber kind has content."""
    off = text_from_offset
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.md5(((F.col("id") + off) * 8 + i).cast("string"))
                for i in range(8)
            ],
        ).alias("text"),
        F.element_at(
            F.array(F.lit("web"), F.lit("books"), F.lit("code")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("grp"),
        (F.col("id") % 97 + 10).alias("val"),
    )


class _NullCache:
    assemblies = 0
    requests = 0
    fallbacks = 0
    cover_hits = 0


@contextlib.contextmanager
def _no_share(base=None):  # same signature as feed_cache.cycle
    yield _NullCache()


def _deploy(spark, root, tag):
    """One table + its seven subscribers; returns (base, drains,
    states)."""
    base = f"{root}/{tag}_src"
    frozen_lm = f"{root}/{tag}_frozen_lm"
    write_snapshot(_docs(spark, 0, N_DOCS).repartition(8), base)
    write_snapshot(
        lm_counts(_docs(spark, 0, 2_000)), frozen_lm,
        meta={"kind": "bigram_lm"},
    )
    ck = lambda k: f"{root}/{tag}_ck_{k}"  # noqa: E731
    st_ = lambda k: f"{root}/{tag}_state_{k}"  # noqa: E731
    drains = [
        partial(maintain_bloom_from_commits, spark, base, "doc_id",
                st_("bloom"), ck("bloom"), num_bits=1 << 18, k=5),
        partial(maintain_agg_from_commits, spark, base, st_("agg"),
                ck("agg"), group_col="grp", key_col="doc_id",
                sum_col="val"),
        partial(maintain_lm_from_commits, spark, base, st_("lm"),
                ck("lm")),
        partial(maintain_ppl_histogram_from_commits, spark, base,
                frozen_lm, st_("ppl"), ck("ppl"), **GEO),
        partial(maintain_dsir_from_commits, spark, base, st_("dsir"),
                ck("dsir"), n_buckets=256),
        partial(maintain_lsh_index_from_commits, spark, base,
                st_("lsh"), ck("lsh"), bands=4, num_hashes=8,
                shingle_n=3),
        partial(maintain_span_index_from_commits, spark, base,
                st_("span"), ck("span"), shingle_n=8),
    ]
    states = {k: st_(k) for k in
              "bloom agg lm ppl dsir lsh span".split()}
    return base, drains, states


def _evolve(spark, base, nxt):
    append_snapshot(_docs(spark, nxt, nxt + 200), base)
    merge_snapshot(
        _docs(spark, nxt - 4_000, nxt - 3_970, text_from_offset=-9_999),
        base, key_col="doc_id",
    )


def _drain_cycle(spark, base, drains):
    t = time.perf_counter()
    report = maintenance_cycle(
        spark, base, drains=drains, checkpoint=False,
    )
    return time.perf_counter() - t, report


def sustained_full_loop(spark, root, n_cycles=10):
    """The realistic day-2 composition: all seven subscriber kinds
    draining through the FULL maintenance_cycle (shared feed +
    subscriber-state compaction + commit-log checkpoint + retention
    GC) for n_cycles of append+merge churn. Claims measured: cycle
    wall FLAT (first-3 vs last-3 medians) because compaction absorbs
    the merge-on-read debt the drains-only variant deliberately let
    grow, exactly ONE feed assembly per cycle, and agg/LM end states
    equal from-scratch rebuilds after the final cycle."""
    base, drains, states = _deploy(spark, root, "flat")
    for d in drains:
        d()  # bootstrap
    walls, asm = [], []
    nxt = N_DOCS
    for c in range(n_cycles):
        _evolve(spark, base, nxt)
        nxt += 200
        t = time.perf_counter()
        report = maintenance_cycle(
            spark, base,
            drains=drains,
            subscriber_states=list(states.values()),
            compact=dict(max_data_dirs=12, max_delete_entries=6),
            compact_subscribers=dict(
                max_data_dirs=12, max_delete_entries=6
            ),
            gc=dict(keep=3, orphan_min_age_s=0),
        )
        walls.append(time.perf_counter() - t)
        asm.append(report["feed_assemblies"])
        print(
            f"flat cycle {c}: {walls[-1]:6.2f}s  "
            f"assemblies {asm[-1]}  cover_hits "
            f"{report['feed_cover_hits']}  fallbacks "
            f"{report['feed_fallbacks']}"
        )
    med = statistics.median
    first3, last3 = med(walls[:3]), med(walls[-3:])
    print(
        f"flat_cycle_wall_s         first3 {first3:6.2f}  "
        f"last3 {last3:6.2f}  (ratio {last3 / first3:0.2f})"
    )
    print(f"assemblies_per_cycle      {med(asm):.0f} (7 drains)")
    head = read_snapshot(spark, base)
    got_agg = sorted(
        tuple(r) for r in read_snapshot(spark, states["agg"]).collect()
    )
    want_agg = sorted(
        tuple(r)
        for r in head.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("val").alias("total"))
        .collect()
    )
    got_lm_n = read_snapshot(spark, states["lm"]).count()
    want_lm_n = lm_counts(head, "text").count()
    print(
        f"end states: agg == rebuilt {got_agg == want_agg}; "
        f"lm rows {got_lm_n} vs scratch {want_lm_n} "
        f"({got_lm_n == want_lm_n})"
    )


def main():
    spark = get_spark(
        app_name="shared_feed_cycle", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="shared_feed_")
    try:
        t0 = time.perf_counter()
        base_a, drains_a, states_a = _deploy(spark, root, "shared")
        base_b, drains_b, states_b = _deploy(spark, root, "solo")
        for d in drains_a + drains_b:
            d()  # bootstrap (full builds, once per subscriber)
        print(
            f"bootstrap_s               "
            f"{time.perf_counter() - t0:6.1f}  "
            f"(2 deployments x 7 subscribers over {N_DOCS:,} docs)"
        )
        walls_a, walls_b, asm_a, asm_b = [], [], [], []
        real_cycle = feed_cache.cycle
        nxt = N_DOCS
        for c in range(N_CYCLES):
            _evolve(spark, base_a, nxt)
            _evolve(spark, base_b, nxt)
            nxt += 200
            order = ("a", "b") if c % 2 == 0 else ("b", "a")
            for which in order:
                if which == "a":
                    feed_cache.cycle = real_cycle
                    w, rep = _drain_cycle(spark, base_a, drains_a)
                    walls_a.append(w)
                    asm_a.append(rep["feed_assemblies"])
                else:
                    feed_cache.cycle = _no_share
                    try:
                        w, rep = _drain_cycle(spark, base_b, drains_b)
                    finally:
                        feed_cache.cycle = real_cycle
                    walls_b.append(w)
                    asm_b.append(rep["feed_assemblies"])
            print(
                f"cycle {c}: shared {walls_a[-1]:6.2f}s "
                f"({asm_a[-1]} assembly)   unshared {walls_b[-1]:6.2f}s "
                f"({asm_b[-1]} assemblies, 7 narrow)"
            )
        med = statistics.median
        ma, mb = med(walls_a), med(walls_b)
        print(
            f"drain_cycle_wall_s        shared {ma:6.2f}  "
            f"unshared {mb:6.2f}  ratio {mb / ma:0.2f}x"
        )
        print(
            f"assemblies_per_cycle      shared {med(asm_a):.0f}  "
            f"unshared 7 (one narrow feed per subscriber)"
        )
        # parity: sharing must not change any maintained state
        for tag, base, states in (
            ("shared", base_a, states_a),
            ("unshared", base_b, states_b),
        ):
            head = read_snapshot(spark, base)
            got_agg = sorted(
                tuple(r)
                for r in read_snapshot(spark, states["agg"]).collect()
            )
            want_agg = sorted(
                tuple(r)
                for r in head.groupBy("grp")
                .agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.sum("val").alias("total"),
                )
                .collect()
            )
            got_lm_n = read_snapshot(spark, states["lm"]).count()
            want_lm_n = lm_counts(head, "text").count()
            print(
                f"{tag}: agg == rebuilt {got_agg == want_agg}   "
                f"lm rows maintained {got_lm_n} vs scratch {want_lm_n} "
                f"({got_lm_n == want_lm_n})"
            )
        sustained_full_loop(spark, root)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
