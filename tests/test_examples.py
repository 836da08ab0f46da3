"""The examples/ walkthroughs are part of the public surface — run
each end-to-end at sf0.001 in a subprocess (own Spark session, like a
user would) and require its success marker. Protects the three entry
points from bitrot as the library evolves."""

from __future__ import annotations

import subprocess
import sys

import pytest

_EXAMPLES = [
    ("examples/run_reference_workload.py", ""),
    ("examples/run_training_pipeline.py", ""),
    ("examples/run_streaming_curation.py", "OK — all six streaming stages"),
    ("examples/run_bus_operations.py", "OK — bus operations loop"),
    ("examples/run_lakehouse_loop.py",
     "OK — lakehouse loop (land/replay/compact/cdc/ivf/delete/gc)"),
    ("examples/run_curation_churn.py",
     "OK — curation churn loop (merge/delete/drain/verify)"),
    ("examples/run_quota_quality_loop.py",
     "OK — quota/quality curation loop (cap/keepers/histogram/stream)"),
]


@pytest.mark.parametrize("script,marker", _EXAMPLES)
def test_example_runs_clean(script, marker):
    r = subprocess.run(
        [sys.executable, script, "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    if marker:
        assert marker in r.stdout, r.stdout[-2000:]
