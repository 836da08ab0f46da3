"""operators/bloom: DataFrame-native Bloom filter invariants.

The driver-gated equality (benchmark_overlap_bloom == exact oracle)
only holds because the fixture configuration has zero false positives;
these tests pin the GENERAL contract, including configurations where
FPs are forced to occur.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vector_db_setup_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
)


def _members_df(spark, lo, hi, col="s"):
    return spark.range(lo, hi).select(
        F.concat(F.lit("item-"), F.col("id")).alias(col)
    )


def test_no_false_negatives(spark):
    """Every inserted member must probe True — the Bloom guarantee."""
    members = _members_df(spark, 0, 2000)
    words = bloom_build(members, "s", num_bits=1 << 16, k=5)
    probed = bloom_probe(members, "s", words, num_bits=1 << 16, k=5)
    assert probed.filter(~F.col("maybe_member")).count() == 0


def test_fp_rate_within_bound(spark):
    """Probe 20k NON-members against a deliberately tight filter
    (n=2000, m=2^14 → theoretical fp ≈ (1-e^(-kn/m))^k ≈ 7.4%) and
    require the measured rate within 2x of theory — loose enough to be
    seed-stable, tight enough to catch a broken hash or bit layout
    (which sends the rate to ~0% or ~100%)."""
    n, m, k = 2000, 1 << 14, 5
    members = _members_df(spark, 0, n)
    others = _members_df(spark, 1_000_000, 1_020_000)
    words = bloom_build(members, "s", num_bits=m, k=k)
    fp = (
        bloom_probe(others, "s", words, num_bits=m, k=k)
        .filter(F.col("maybe_member"))
        .count()
    )
    rate = fp / 20_000
    theory = (1 - math.exp(-k * n / m)) ** k
    assert 0 < rate < 2 * theory, (rate, theory)


def test_merge_equals_union_build(spark):
    """bit_or lattice: merging two filters == building one filter over
    the union of their items (bitmaps identical word-for-word)."""
    a = _members_df(spark, 0, 500)
    b = _members_df(spark, 400, 900)
    merged = bloom_merge(
        bloom_build(a, "s", num_bits=1 << 14, k=4),
        bloom_build(b, "s", num_bits=1 << 14, k=4),
    )
    direct = bloom_build(a.unionByName(b), "s", num_bits=1 << 14, k=4)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_probe_keeps_input_columns_and_dups(spark):
    """Probe appends its column; duplicate input rows survive as one
    group with a correct verdict (the sum==count equality, not ==k)."""
    members = _members_df(spark, 0, 100)
    words = bloom_build(members, "s", num_bits=1 << 14, k=4)
    probe_in = spark.createDataFrame(
        [("item-5", "x"), ("item-5", "x"), ("nope-1", "y")], ["s", "tag"]
    )
    got = {
        (r["s"], r["tag"]): r["maybe_member"]
        for r in bloom_probe(
            probe_in, "s", words, num_bits=1 << 14, k=4
        ).collect()
    }
    assert got[("item-5", "x")] is True
    assert got[("nope-1", "y")] is False


def test_build_plan_is_partial_aggregate_and_probe_broadcasts(spark):
    """Scale contract: the build does map-side partial bit_or before
    its one keyed exchange, and the default probe joins the word table
    with a broadcast (never a cartesian or a data-sized shuffle of the
    probe side against it)."""
    members = _members_df(spark, 0, 1000)
    words = bloom_build(members, "s", num_bits=1 << 16, k=5)
    build_plan = words._jdf.queryExecution().executedPlan().toString()
    assert build_plan.count("HashAggregate") >= 2, build_plan  # partial+final
    probed = bloom_probe(
        _members_df(spark, 0, 10), "s", words, num_bits=1 << 16, k=5
    )
    probe_plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in probe_plan, probe_plan
    assert "Cartesian" not in probe_plan, probe_plan


def test_grouped_probe_counts_equal_distinct_probe_composition(spark):
    """bloom_probe_group_counts == distinct() + bloom_probe + groupBy,
    including duplicate (group, item) inputs and a configuration that
    FORCES false positives (tiny filter) — the counts must agree with
    the composed pipeline bit-for-bit, FPs included."""
    from vector_db_setup_spark.operators.bloom import (
        bloom_probe_group_counts,
    )

    members = _members_df(spark, 0, 400)
    # tiny filter: m=2^8 bits, 400 members -> saturated, many FPs
    words = bloom_build(members, "s", num_bits=1 << 8, k=3)
    probe = spark.range(0, 900).select(
        (F.col("id") % 3).alias("grp"),
        F.concat(F.lit("probe-"), (F.col("id") % 150)).alias("s"),
    )  # duplicates: each (grp, s) appears twice
    got = {
        r["grp"]: (r["n_total"], r["n_hit"])
        for r in bloom_probe_group_counts(
            probe, "s", "grp", words, num_bits=1 << 8, k=3
        ).collect()
    }
    composed = (
        bloom_probe(
            probe.distinct(), "s", words, num_bits=1 << 8, k=3
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("maybe_member").cast("long")).alias("n_hit"),
        )
        .collect()
    )
    want = {r["grp"]: (r["n_total"], r["n_hit"]) for r in composed}
    assert got == want
    # FPs were actually forced (every probe item is a non-member)
    assert sum(h for _, h in got.values()) > 0


def test_grouped_probe_plan_has_no_k_volume_exchange(spark):
    """Scale contract (r12): the grouped probe's exchanges are the two
    aggregation shuffles (per-(group,item) partial, per-group fold) —
    the word-table join is a broadcast and no Exchange sits between
    the probe explode and the first partial aggregate."""
    from vector_db_setup_spark.operators.bloom import (
        bloom_probe_group_counts,
    )

    members = _members_df(spark, 0, 100)
    words = bloom_build(members, "s", num_bits=1 << 14, k=5)
    probe = spark.range(0, 50).select(
        (F.col("id") % 2).alias("grp"),
        F.concat(F.lit("item-"), F.col("id")).alias("s"),
    )
    plan = (
        bloom_probe_group_counts(probe, "s", "grp", words)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "Cartesian" not in plan, plan
    # the explode's k-row volume is reduced by a map-side partial
    # (partial_sum over _hit per (group, item)) BEFORE any exchange —
    # the shape that replaces bloom_probe's per-row-id regroup shuffle
    assert "partial_sum(cast(_hit" in plan, plan
    # exactly three keyed exchanges: the (group, item) partial, the
    # per-group fold, and the word-table build's own bit_or exchange
    # (inside the broadcast subtree) — none keyed on a per-row id
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert "__bloom_rid" not in plan, plan
