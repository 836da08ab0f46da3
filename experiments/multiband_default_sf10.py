"""Auto-sized multiband planes at sf10 (r10 follow-up to the r9
plane-count addendum): the r9 measurement showed the multiband
kernel's cost is occupancy-proportional — 4 fixed planes cost 25.2 s
at 200k vectors vs the sizing rule's 11 planes at 6.2 s — but the
OPERATOR still required callers to pass planes. r10 made the rule the
default (`cosine_pairs_multiband(plane_sets=None)` →
`auto_hyperplanes` per band); this measures that the DEFAULT call now
lands on the rule-sized point, against the fixture's literal 4-plane
sets as the regression baseline.

Same shape as the r9 addendum: 200k vectors (sf10 fixture from
sf10_headline_scaling.py), two bands, topk_per_bucket=20, warm median
of 3. Run:  python experiments/multiband_default_sf10.py  (~3 min).
Results recorded in SCALE_EXPERIMENTS.md (r10 update under the
plane-count addendum).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from vector_db_setup_spark.operators.ann import random_hyperplanes
from vector_db_setup_spark.operators.similarity import (
    auto_hyperplanes,
    cosine_pairs_multiband,
)
from vector_db_setup_spark.session import get_spark

SF10 = os.environ.get("SF10_DIR", "/tmp/sf10_scaling")


def main():
    spark = get_spark(
        app_name="multiband-default-sf10",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    emb = spark.read.parquet(f"{SF10}/embeddings.parquet").persist()
    n = emb.count()
    d = 64
    print(f"corpus: {n:,} vectors, dim {d}")
    auto = auto_hyperplanes(n, d)
    print(f"auto_hyperplanes -> {auto.shape[0]} planes "
          f"({2 ** auto.shape[0]} buckets/band)")

    def measure(label, **kw):
        def once():
            t0 = time.perf_counter()
            cosine_pairs_multiband(
                emb, topk_per_bucket=20, n_rows=n, **kw
            ).count()
            return time.perf_counter() - t0

        once()  # warm
        t = statistics.median(once() for _ in range(3))
        print(f"{label:<28} {t:7.2f} s warm")
        return t

    fixture = [random_hyperplanes(d, 4, seed=s) for s in (1, 2)]
    measure("fixture 2x4 planes", plane_sets=fixture)
    measure("default (auto, 2 bands)", n_bands=2)
    emb.unpersist()


if __name__ == "__main__":
    main()
