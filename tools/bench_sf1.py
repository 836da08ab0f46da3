#!/usr/bin/env python3
"""Per-round sf1 headline bench → BENCH_sf1_r{N}.json (VERDICT r12
item 1): the one regression class the sf0.1-only round loop cannot
catch is a SCALING (exponent) regression — a plan whose constant is
fine at sf0.1 but whose growth crept super-linear. This wrapper runs
the 12 BASELINE-comparable headline queries at sf0.1 AND a synthesized
sf1 (the same 10×-replica synthesis as
experiments/sf1_headline_scaling.py — key-shifted replicas, disjoint
shingle spaces, rotated embeddings) in ONE session with bench.py's
methodology (min-of-2 colds, warm pass, per-pass load stamps, fixed-
work calibration), and records per-query + aggregate warm exponents
against the r11 baseline (aggregate 0.38, SCALE_EXPERIMENTS.md
"Headline scaling sf0.1 → sf1 re-run (r11)").

Exponents compare WARM-to-warm: cold-to-cold encodes which scale ran
first (the experiment's first draft measured a negative minhash
exponent purely from that ordering bias). The sub-second caveat from
SCALE_EXPERIMENTS.md applies per query: the ~0.3-0.5 s scheduler
floor inflates the sf0.1 denominator, DEFLATING small-query
exponents; the aggregate and the "nothing super-linear" check are the
round-over-round signals.

Run from the repo root (round number optional; defaults to one past
the newest BENCH_r{N}.json):

    python3 tools/bench_sf1.py [round]

~10-15 min on local[32]; the sf1 synthesis is cached in $SF1_DIR
(default /tmp/sf1_scaling) across runs.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import CALIB_REF, HEADLINE, _calibrate, _force  # noqa: E402
from experiments.sf1_headline_scaling import OUT, synth_sf1  # noqa: E402
from vector_db_setup_spark import queries as q  # noqa: E402
from vector_db_setup_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# r11 aggregate warm exponent (SCALE_EXPERIMENTS.md) — the baseline
# this artifact exists to compare against, round over round
EXPONENT_BASELINE_R11 = 0.38


def _round_number() -> int:
    if len(sys.argv) > 1:
        return int(sys.argv[1])
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def _pass(spark, qs, sf_dir: str, label: str) -> dict:
    """One timed pass over the headline set (fresh memo-persist cache),
    with its own load stamp — the adjudication context BENCH_r{N}
    carries per query."""
    q.clear_persist_cache(spark)
    times = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)
    print(f"  {label}: total={round(sum(times.values()), 3)}s "
          f"load={os.getloadavg()[0]:.2f}", file=sys.stderr)
    return {"times": times, "load_avg_1m": round(os.getloadavg()[0], 2)}


def run_scale(spark, qs, sf_dir: str) -> dict:
    """min-of-2 colds + one warm, bench.py's noise-robust shape."""
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # warm FS
    cold1 = _pass(spark, qs, sf_dir, f"{sf_dir} cold1")
    cold2 = _pass(spark, qs, sf_dir, f"{sf_dir} cold2")
    warm = _pass(spark, qs, sf_dir, f"{sf_dir} warm")
    # NOTE: passes 2+ reuse the session's warmed codegen/scan state, so
    # "cold" here means cold memo-persist cache (same as bench.py's
    # queries_cold2 second pass)
    cold_min = {
        n: min(cold1["times"][n], cold2["times"][n]) for n in HEADLINE
    }
    return {
        "cold1": cold1,
        "cold2": cold2,
        "warm": warm,
        "cold_min": cold_min,
        "value_cold_min": round(sum(cold_min.values()), 3),
        "value_warm": round(sum(warm["times"].values()), 3),
    }


def main() -> None:
    rnd = _round_number()
    spark = get_spark(
        app_name="bench-sf1",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    synth_sf1(spark)
    calib = _calibrate(spark)
    calib_factor = round(
        math.sqrt(
            (calib["numpy_gemm_s"] / CALIB_REF["numpy_gemm_s"])
            * (calib["spark_codegen_s"] / CALIB_REF["spark_codegen_s"])
        ),
        3,
    )
    qs = q.queries()
    small = run_scale(spark, qs, SRC)
    big = run_scale(spark, qs, OUT)
    exponents = {
        n: round(
            math.log10(big["warm"]["times"][n] / small["warm"]["times"][n]),
            3,
        )
        for n in HEADLINE
        if small["warm"]["times"][n] > 0
    }
    agg = round(
        math.log10(big["value_warm"] / small["value_warm"]), 3
    )
    out = {
        "metric": "sf1_headline_warm_exponent",
        "value": agg,
        "unit": "log10(t_sf1/t_sf0.1)",
        "round": rnd,
        "exponent_baseline_r11": EXPONENT_BASELINE_R11,
        "exponents_warm": exponents,
        "max_exponent_warm": max(exponents.values()),
        "sf0.1": small,
        "sf1": big,
        "calibration": calib,
        "calib_ref": CALIB_REF,
        "calib_factor": calib_factor,
        "sf1_dir": OUT,
        "sf0.1_dir": SRC,
    }
    path = os.path.join(REPO, f"BENCH_sf1_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "metric": out["metric"], "value": agg,
        "baseline_r11": EXPONENT_BASELINE_R11,
        "max_exponent": out["max_exponent_warm"],
        "calib_factor": calib_factor, "wrote": path,
    }))


if __name__ == "__main__":
    main()
