#!/usr/bin/env python3
"""Dump `.explain("formatted")` for a set of declared queries into
plans/r{N}/<query>_<suffix>.txt — the judge-auditable evidence files
for optimization rounds (plan claims in OPTIMIZATION_r{N}.md are
checked against these).

Usage (from a repo/worktree root; PYTHONPATH decides WHICH code the
plans describe, so before-plans come from a worktree at the round's
base commit and after-plans from HEAD):

    python tools/dump_plans.py <out_dir> <suffix> <query> [<query>...]

Plans are captured on the sf0.1 fixtures (same data the bench times)
at local[$SPARK_GRAFT_CPUS]. The persist-memo cache is cleared before
every capture so each file shows the standalone cold lineage, not a
cache-state-dependent InMemoryTableScan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from vector_db_setup_spark import queries as q
    from vector_db_setup_spark.session import get_spark

    spark = get_spark(app_name=f"dump-plans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = q.queries()
    for name in names:
        q.clear_persist_cache(spark)
        df = qs[name](spark, SF_DIR)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
