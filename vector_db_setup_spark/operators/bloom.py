"""Distributed Bloom filter as pure DataFrame aggregation.

The contamination check in `queries.benchmark_overlap` broadcasts the
benchmark's exact shingle set — right while that set fits in a
broadcast (tens of MB). At 100 TB a held-out suite can carry billions
of shingles; the scale path is a Bloom filter: ~1.2 GB of bits screens
10^9 members at 1e-3 false positives, and membership never needs the
set itself.

Spark ships a Bloom filter (`df.stat.bloomFilter`,
`org.apache.spark.util.sketch.BloomFilter`) but it aggregates into the
DRIVER eagerly and probes through the JVM gateway — the same
anti-pattern the count-min probe had before `functions/sketch.py`
(ADVICE r4). `bloom_filter_agg` exists in Catalyst for runtime join
pruning but is not registered as a public function (checked on 4.1.2).
So this module builds the filter as a plain DataFrame the optimizer
understands:

  build:  item → (h1, h2) = (xxhash64(item), xxhash64(item, 1))
          → k Kirsch-Mitzenmacher positions pmod(h1 + i·h2, m)
          → groupBy(pos div 64).agg(bit_or(1L << (pos mod 64)))
          = the NONZERO 64-bit words of the bitmap, as rows.

  probe:  same k positions → join the word table on word index
          → bit-test each → AND over the k probes (count(hit) = k).

Everything is whole-stage-codegen expressions; `bit_or` is
distributive, so the build does map-side partial aggregation and
shuffles at most m/64 tiny rows. The filter IS a DataFrame: persist
it, write it to parquet, union two of them and re-`bit_or` to merge —
the lattice property comes free. Nothing is eager, nothing touches
the driver, and both sides stay lazy until an action.

All arithmetic is kept inside long range under ANSI mode (Spark 4
default): h1/h2 are reduced mod m BEFORE the i·h2 combination, so the
largest intermediate is k·m < 2^40 for any practical m.

Scale: m = 2^27 bits is a 2 MB word table (broadcast probe); at
m = 2^34 (1e9 members) the word table is ~256 MB of rows — pass
broadcast=False and the probe becomes a keyed shuffle join, which is
exactly how a 100 TB corpus screens against a benchmark too big to
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_build",
    "bloom_probe",
    "bloom_probe_group_counts",
    "bloom_merge",
    "bloom_update_from_changes",
]

# probe-internal working names: silently shadowed by withColumn if the
# caller's data uses them, so both probes refuse them up front
_PROBE_RESERVED = frozenset(
    {"_pos", "_i", "_idx", "_mask", "_hit", "_widx", "_word"}
)


def _refuse_reserved(fn: str, cols, extra=()) -> None:
    clash = (_PROBE_RESERVED | set(extra)) & set(cols)
    if clash:
        raise ValueError(
            f"{fn} reserves column names {sorted(clash)}; "
            "rename them on the input first"
        )


def _positions(df: DataFrame, item_col: str, num_bits: int, k: int) -> DataFrame:
    """Explode each row into its k bit positions (keeps all other cols).

    Kirsch-Mitzenmacher double hashing: pos_i = (h1 + i*h2) mod m with
    two independent 64-bit hashes (xxhash64 of the item alone and of
    the item salted with a literal). Both are reduced mod m first so
    the combination cannot overflow under ANSI arithmetic.
    """
    b1 = F.pmod(F.xxhash64(F.col(item_col)), F.lit(num_bits))
    b2 = F.pmod(F.xxhash64(F.col(item_col), F.lit(1)), F.lit(num_bits))
    return (
        df.withColumn("_i", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn("_pos", F.pmod(b1 + F.col("_i") * b2, F.lit(num_bits)))
        .drop("_i")
    )


def bloom_build(
    df: DataFrame, item_col: str, num_bits: int = 1 << 22, k: int = 5
) -> DataFrame:
    """Aggregate a column into Bloom-filter words: (idx long, word long).

    Only nonzero words materialize, so a sparse filter costs less than
    its nominal m/64 rows. `bit_or` is distributive → partial agg
    map-side, one keyed shuffle of at most m/64 rows total.
    """
    return (
        _positions(df.select(item_col), item_col, num_bits, k)
        .groupBy(F.shiftright("_pos", 6).alias("idx"))
        # SQL shiftleft takes a column shift count; the Python wrapper
        # insists on a literal, hence expr.
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT))")
            ).alias("word")
        )
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union filters built with the SAME (num_bits, k): re-bit_or the
    word tables. Bloom union is exact (bitwise OR), so incremental
    builds (per day / per source) merge without touching the items."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("idx").agg(F.bit_or("word").alias("word"))


def bloom_probe(
    df: DataFrame,
    item_col: str,
    words: DataFrame,
    num_bits: int = 1 << 22,
    k: int = 5,
    out_col: str = "maybe_member",
    broadcast: bool = True,
) -> DataFrame:
    """Append a boolean column: True iff ALL k bits are set (possible
    member — false positives at the configured rate, never false
    negatives). Probe cost: k rows per input row joined against the
    word table (broadcast when it fits, keyed shuffle when it does
    not), then one groupBy back over the input's own columns."""
    _refuse_reserved("bloom_probe", df.columns, extra=("__bloom_rid",))
    wt = words.select(F.col("idx").alias("_widx"), F.col("word").alias("_word"))
    if broadcast:
        wt = F.broadcast(wt)
    # per-row id BEFORE the explode: the regroup keys on it, so (a)
    # duplicate input rows stay distinct rows in the output and (b)
    # non-groupable columns (maps) ride through first() untouched —
    # grouping on df.columns (the previous shape) collapsed duplicates
    # and rejected map columns outright. One lineage, no self-join.
    base = df.withColumn("__bloom_rid", F.monotonically_increasing_id())
    probed = (
        _positions(base, item_col, num_bits, k)
        .withColumn("_idx", F.shiftright("_pos", 6))
        .withColumn(
            "_mask",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT))"),
        )
        .join(wt, F.col("_idx") == F.col("_widx"), "left")
        .withColumn(
            "_hit",
            (F.col("_word").isNotNull())
            & (F.col("_word").bitwiseAND(F.col("_mask")) != 0),
        )
    )
    return (
        probed.groupBy("__bloom_rid")
        .agg(
            *[F.first(c).alias(c) for c in df.columns],
            (F.sum(F.col("_hit").cast("long")) == F.count(F.lit(1))).alias(
                out_col
            ),
        )
        .drop("__bloom_rid")
    )


def bloom_probe_group_counts(
    df: DataFrame,
    item_col: str,
    group_col: str,
    words: DataFrame,
    num_bits: int = 1 << 22,
    k: int = 5,
    broadcast: bool = True,
) -> DataFrame:
    """Per-group distinct-item totals and Bloom-member counts in ONE
    aggregation tree: (group_col, n_total, n_hit) where n_total counts
    DISTINCT items in the group and n_hit those whose k probe bits are
    all set.

    Shuffle shape (why this exists, r12 — the benchmark_overlap_bloom
    warm-profile finding): composing distinct() + bloom_probe +
    groupBy costs THREE shuffles, one of them carrying k× the item
    volume (bloom_probe's per-row regroup keys on a per-row id, so
    every exploded probe row crosses the wire). Here the k-bit AND
    folds inside the FIRST aggregation: explode k positions,
    broadcast-join the word table (no shuffle), partial-aggregate per
    (group, item) map-side — the exchange carries ~distinct
    (group, item) rows — then one tiny per-group fold. Two map-side-
    combined shuffles, none above distinct-pair volume. Duplicate
    (group, item) inputs are safe without a pre-distinct: duplicates
    share the same probe bits, so sum(hit) == count(rows) still means
    "all k bits set"."""
    # same clash guard as bloom_probe (ADVICE r12: group_col='_idx'
    # silently grouped by the probe's word index), plus this probe's
    # own working/output names
    _refuse_reserved(
        "bloom_probe_group_counts",
        (group_col, item_col),
        extra=("_member", "n_total", "n_hit"),
    )
    wt = words.select(
        F.col("idx").alias("_widx"), F.col("word").alias("_word")
    )
    if broadcast:
        wt = F.broadcast(wt)
    per_item = (
        _positions(
            df.select(group_col, item_col), item_col, num_bits, k
        )
        .withColumn("_idx", F.shiftright("_pos", 6))
        .withColumn(
            "_mask",
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT))"
            ),
        )
        .join(wt, F.col("_idx") == F.col("_widx"), "left")
        .withColumn(
            "_hit",
            (F.col("_word").isNotNull())
            & (F.col("_word").bitwiseAND(F.col("_mask")) != 0),
        )
        .groupBy(group_col, item_col)
        .agg(
            (F.sum(F.col("_hit").cast("long")) == F.count(F.lit(1))).alias(
                "_member"
            )
        )
    )
    return per_item.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("_member").cast("long")).alias("n_hit"),
    )


def bloom_update_from_changes(
    spark,
    base: str,
    key_col: str,
    words: DataFrame,
    from_version: int,
    to_version: int | None = None,
    num_bits: int = 1 << 22,
    k: int = 5,
    fs=None,
) -> DataFrame:
    """Maintain a decontamination Bloom filter from the snapshot CDC
    feed: build a filter over keys ADDED since ``from_version`` and
    bit-or it into ``words`` — the filter stays current by ingesting
    per-version increments instead of re-scanning the corpus (the 100
    TB maintenance shape: the nightly delta is MBs, the corpus is not).

    Only ``added`` keys matter: a ``changed`` key is already set, and
    Bloom has no delete, so ``removed`` keys linger as extra false
    positives until the next full rebuild — CONSERVATIVE for
    decontamination (screening can only over-flag, never miss a
    benchmark member). Replays are free: re-ingesting the same change
    range ORs in bits that are already set, so consumption need not be
    exactly-once — matching snapshot_changes' immutable-range contract.

    ``words`` must have been built with the SAME (num_bits, k); the
    result is the merged word table (lazy, like every bloom_* op).
    """
    from vector_db_setup_spark.streaming.feed_cache import cdc_changes

    added = (
        cdc_changes(
            # columns=[]: key-presence-only feed — 'added' detection
            # needs no value hashing (cheaper on wide documents) and
            # survives merge_schema boundaries, where a full-column
            # diff would refuse the asymmetric version pair. Routed
            # through the cycle feed cache so a maintenance_cycle
            # drain shares one assembly with its sibling subscribers
            # (outside a cycle: a verbatim snapshot_changes call).
            spark, base, key_col, from_version, to_version, fs=fs,
            columns=[],
        )
        .filter(F.col("status") == "added")
        .select(key_col)
        .distinct()
    )
    return bloom_merge(words, bloom_build(added, key_col, num_bits, k))
