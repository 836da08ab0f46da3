"""Measure what the r13 union-range prewarm saves in the laggard
scenario (VERDICT r12 What's-wrong #2 / next-round #3).

Scenario: four subscriber kinds where ONE (the n-gram LM — the most
assembly-sensitive consumer) lags several source commits behind the
other three. Under ``parallel_drains`` the pre-r13 cover depended on
which drain won the cache lock: when a head-cursor subscriber
assembled first, the laggard's wider range could not be served by
sub-range cover and paid a SECOND full assembly. The prewarm reads
every subscriber's cursor up front and assembles the union
(min cursor, head] once, making one-assembly-per-key deterministic.

A/B (same deployments, alternating order across cycles):

- PREWARmed: maintenance_cycle(..., subscriber_states=[...]) — the new
  path; expect feed_assemblies == 1 every cycle.
- RACE-LOST: subscriber_states omitted AND the drains submitted
  head-subscribers-first with parallel_drains=1 inside the pool-free
  sequential loop — deterministically reproducing the WORST pre-r13
  schedule (head assembles (h-1, h] first; the laggard's (l, h] then
  misses cover and assembles again). Expect feed_assemblies == 2.

The wall delta per cycle is the duplicated assembly's fixed cost at
fixture scale (the r11 ppl-histogram experiment measured the per-drain
assembly overhead at ~6-7 s; here the duplicate is one extra range
assembly over the same commits). End states are asserted EQUAL between
arms every cycle — the prewarm is a cost optimization, not a semantics
change.

Run:  python experiments/prewarm_laggard.py
(~3-4 min on local[32]; deterministic.) Results recorded in
SCALE_EXPERIMENTS.md "Prewarm vs race-lost laggard assembly".
"""

from __future__ import annotations

import functools
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from vector_db_setup_spark.session import get_spark  # noqa: E402
from vector_db_setup_spark.sources.snapshot_table import (  # noqa: E402
    append_snapshot,
    read_snapshot,
    write_snapshot,
)
from vector_db_setup_spark.streaming.commit_log import (  # noqa: E402
    maintain_agg_from_commits,
    maintain_bloom_from_commits,
    maintain_dsir_from_commits,
    maintain_lm_from_commits,
    maintenance_cycle,
)

N_DOCS = 4000
N_CYCLES = 6
BATCH = 400


def _docs(spark, start, n):
    rows = [
        (
            i,
            " ".join(
                f"tok{(i * 31 + j * 7) % 997}" for j in range(40)
            ),
            "ab"[i % 2],
            i % 100,
        )
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, grp string, val long"
    )


def _deploy(spark, root, tag):
    base = f"{root}/{tag}_src"
    write_snapshot(_docs(spark, 0, N_DOCS).repartition(8), base)
    ck = lambda k: f"{root}/{tag}_ck_{k}"  # noqa: E731
    st_ = lambda k: f"{root}/{tag}_state_{k}"  # noqa: E731
    drains = {
        "bloom": functools.partial(
            maintain_bloom_from_commits, spark, base, "doc_id",
            st_("bloom"), ck("bloom"), num_bits=1 << 16, k=3,
        ),
        "agg": functools.partial(
            maintain_agg_from_commits, spark, base, st_("agg"),
            ck("agg"), group_col="grp", key_col="doc_id", sum_col="val",
        ),
        "dsir": functools.partial(
            maintain_dsir_from_commits, spark, base, st_("dsir"),
            ck("dsir"), n_buckets=64,
        ),
        "lm": functools.partial(
            maintain_lm_from_commits, spark, base, st_("lm"), ck("lm"),
        ),
    }
    states = {k: st_(k) for k in drains}
    return base, drains, states


def _cycle(spark, base, drains, states, prewarm: bool):
    """One maintenance pass. prewarm=True → the new deterministic
    path; False → head-first sequential order, deterministically
    reproducing the pre-r13 race-lost schedule (head subscribers
    drain before the laggard, so the laggard's wider range misses
    sub-range cover)."""
    order = ["bloom", "agg", "dsir", "lm"]  # lm (the laggard) LAST
    t0 = time.perf_counter()
    report = maintenance_cycle(
        spark,
        base,
        drains=[drains[k] for k in order],
        subscriber_states=list(states.values()) if prewarm else None,
        checkpoint=False,
    )
    return time.perf_counter() - t0, report


def main() -> None:
    spark = get_spark(
        app_name="prewarm-laggard",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="prewarm_")
    base_a, drains_a, states_a = _deploy(spark, root, "pw")
    base_b, drains_b, states_b = _deploy(spark, root, "race")
    for d in {**drains_a, **drains_b}.values():
        d()  # bootstrap all subscribers at v1
    walls = {"pw": [], "race": []}
    asms = {"pw": [], "race": []}
    nxt = N_DOCS
    for c in range(N_CYCLES):
        # the head subscribers drain mid-stream so the LM lags: land
        # TWO appends, drain bloom/agg/dsir after the first, then land
        # the second — cursors now diverge by one version
        for which, base, drains in (
            ("pw", base_a, drains_a), ("race", base_b, drains_b)
        ):
            append_snapshot(_docs(spark, nxt, BATCH), base)
            for k in ("bloom", "agg", "dsir"):
                drains[k]()  # head subscribers advance
            append_snapshot(_docs(spark, nxt + BATCH, BATCH), base)
        nxt += 2 * BATCH
        order = (("pw", "race") if c % 2 == 0 else ("race", "pw"))
        for which in order:
            if which == "pw":
                w, rep = _cycle(
                    spark, base_a, drains_a, states_a, prewarm=True
                )
            else:
                w, rep = _cycle(
                    spark, base_b, drains_b, states_b, prewarm=False
                )
            walls[which].append(w)
            asms[which].append(rep["feed_assemblies"])
        print(
            f"cycle {c}: prewarmed {walls['pw'][-1]:6.2f}s "
            f"({asms['pw'][-1]} asm)   race-lost {walls['race'][-1]:6.2f}s "
            f"({asms['race'][-1]} asm)"
        )
    # end-state equality: the optimization must not change semantics
    for k in states_a:
        a = sorted(
            tuple(r) for r in read_snapshot(spark, states_a[k]).collect()
        )
        b = sorted(
            tuple(r) for r in read_snapshot(spark, states_b[k]).collect()
        )
        assert a == b, f"state divergence in {k}"
    med = statistics.median
    print(
        f"\nmedian cycle wall: prewarmed {med(walls['pw']):.2f}s "
        f"(assemblies {asms['pw']})  race-lost {med(walls['race']):.2f}s "
        f"(assemblies {asms['race']})  "
        f"ratio {med(walls['race']) / med(walls['pw']):.2f}x"
    )
    print("end states: EQUAL across arms for all 4 subscriber kinds")


if __name__ == "__main__":
    main()
