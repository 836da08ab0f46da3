"""Regenerate PLANS.md's plan snippets from live executions (VERDICT
r7 "what's wrong" #1: the document advertises plan-audit evidence, so
its snippets must never drift from the code — the flagship section
showed a pre-r5 NULLS FIRST ordering for two rounds).

For every `## <name>` section whose leading token is a `queries()`
key, the fenced code block is replaced with the freshly captured
`executedPlan().toString()` at $SPARK_GRAFT_SF_DIR (default sf0.1);
the section's **Expect:** prose (the documentation value) and any
non-query sections (shard manifest, BPE) are preserved verbatim.
Long literal vectors/codebooks in the plan text are collapsed to
`[<literal vector>]`, as the hand-written snippets did.

Run after any plan-affecting change:  python tools/gen_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLANS.md",
)

# a bracketed run of 8+ numbers is a shipped literal (query vector,
# centroid table, codebook) — noise in a plan snippet
_LIT = re.compile(
    r"\[(?:-?\d+(?:\.\d+)?(?:E-?\d+)?,\s*){8,}-?\d+(?:\.\d+)?(?:E-?\d+)?\]"
)
_FENCE = re.compile(r"```\n.*?```", re.DOTALL)


def _capture(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString().rstrip()
    return _LIT.sub("[<literal vector>]", plan)


def main() -> None:
    from vector_db_setup_spark import queries as q
    from vector_db_setup_spark.session import get_spark

    spark = get_spark(
        app_name="gen-plans",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=32,
    )
    qs = q.queries()
    text = open(PLANS).read()
    # split into header + sections on '## ' headings
    parts = re.split(r"(?m)^## ", text)
    out = [parts[0]]
    n_regen = 0
    for sec in parts[1:]:
        title = sec.split("\n", 1)[0]
        name = re.split(r"[\s(]", title.strip())[0]
        if name in qs:
            plan = _capture(qs[name](spark, SF_DIR))
            # callable replacement: a plan containing backslashes (an
            # RLIKE pattern like \d+) must not be parsed as a regex
            # replacement TEMPLATE (re.error: bad escape / mangling)
            new_sec, n = _FENCE.subn(
                lambda m: f"```\n{plan}\n```", sec, count=1
            )
            if n:
                sec = new_sec
                n_regen += 1
                print(f"regenerated: {name}")
            else:
                print(f"WARNING: no fenced block under '{title}'")
        else:
            print(f"kept verbatim (not a queries() key): {title}")
        out.append(sec)
    open(PLANS, "w").write("## ".join(out))
    print(f"wrote {PLANS}: {n_regen} plans regenerated at {SF_DIR}")


if __name__ == "__main__":
    main()
