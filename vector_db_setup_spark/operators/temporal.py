"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Neither exists in the reference (no joins at all there, SURVEY.md §2.3);
both are core to time-series/feature-store workloads at scale, so they
are implemented as compositions of existing DataFrame ops with plans
that survive 100 TB:

- **as-of join** (latest right row at-or-before each left row, per key):
  the union + window trick — tag sides, union, sort per key by
  (time, side), carry the last non-null right payload forward with
  `last(ignorenulls)`, keep left rows. ONE shuffle (the window), no
  range cross product, no per-key loop. Equivalent to DuckDB's native
  ASOF JOIN (which is the oracle).
- **range join** (right rows in [left_t - delta, left_t) per key): time
  bucketing — both sides keyed by floor(epoch/delta); each left row
  probes its own and the preceding bucket, so every true match is
  co-located and the exact predicate filters bucket-edge misses. An
  equi-join on (key, bucket) instead of an inequality join — cost scales
  with matches, not |L|·|R| per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt) -> bool:
    """True iff Spark defines an ordering over the type (maps — and
    anything containing one — cannot appear in a sort key)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row + the right payload of the
    greatest right_time <= left_time for the same key (null when no
    prior right row exists — LEFT semantics).

    Equal timestamps: the right row wins (sorted before the left row),
    matching ASOF's inclusive <=.

    DUPLICATE right rows at the same (key, right_time): the carried
    payload is the GREATEST (right_time, *payload) struct over the
    ORDERABLE payload columns — a deterministic tie-break (field-wise
    struct ordering) where a bare (time, side) sort would carry
    whichever duplicate happened to sort last that run. Non-orderable
    payload columns (maps, or structs/arrays containing them) are
    carried but excluded from the tie-break (Spark defines no ordering
    over them — ADVICE r12: putting them in the sort key failed
    analysis); duplicates distinguished ONLY by such a column remain
    implementation-defined, same as DuckDB's native ASOF — dedup the
    right side first when that matters.
    """
    r_struct = F.struct(
        F.col(right_time).alias("__rt"), *[F.col(c) for c in right_payload]
    )
    r_type = right.select(r_struct.alias("__r")).schema["__r"].dataType
    # tie-break struct: only payload columns Spark can sort (a MapType
    # in the window orderBy is an analysis error, not a slow path).
    # When EVERY payload column is orderable — the common case — __r
    # itself is the sort key and no separate projection ships through
    # the shuffle; the extra __rs column exists only when a
    # non-orderable column must be excluded from the tie-break.
    sortable = [
        c
        for c in right_payload
        if _orderable(right.schema[c].dataType)
    ]
    all_orderable = len(sortable) == len(right_payload)
    s_struct = F.struct(
        F.col(right_time).alias("__rt"), *[F.col(c) for c in sortable]
    )
    s_type = right.select(s_struct.alias("__rs")).schema["__rs"].dataType

    l2 = left.select(
        F.col(key),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
        *(
            []
            if all_orderable
            else [F.lit(None).cast(s_type).alias("__rs")]
        ),
    )
    r2 = right.select(
        F.col(key),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l2.schema["__l"].dataType).alias("__l"),
        r_struct.alias("__r"),
        *([] if all_orderable else [s_struct.alias("__rs")]),
    )
    # the orderable projection as the final sort key: among right rows
    # sharing (key, time) the LAST one wins last(ignorenulls), so
    # order them by it — deterministic, run-stable. Left rows (sort
    # struct null, __side=1) sort after every same-time right row
    # regardless.
    sort_key = "__r" if all_orderable else "__rs"
    w = Window.partitionBy(key).orderBy("__t", "__side", sort_key).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = (
        l2.unionByName(r2)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__match.__rt").alias(f"{prefix}{right_time}"))
    out_cols.extend(
        F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_payload
    )
    return carried.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    delta_seconds: int,
) -> DataFrame:
    """Inner range join: pairs (left, right) with the same key and
    right_time in [left_time - delta, left_time).

    Bucketing: bucket width == delta, left probes buckets {b-1, b} —
    covers the full range window with exactly 2 equi-join probes.

    Same-named time columns are supported (like `asof_join`): the two
    times are compared through internal __lt/__rt aliases, so
    range_join(l, r, 'k', 'ts', 'ts', 60) resolves unambiguously; any
    OTHER shared column name still duplicates in the output (standard
    join behavior) — project/rename first if that matters.
    """
    # withColumn would silently overwrite (and the tail drop() remove)
    # a caller's column of the same name — refuse, same clash class as
    # bloom_probe's reserved names (r13 review pass)
    clash = {"__rt", "__lt", "__b"} & (
        set(left.columns) | set(right.columns)
    )
    if clash:
        raise ValueError(
            f"range_join reserves column names {sorted(clash)}; "
            "rename them on the input first"
        )
    b_r = F.floor(F.col(right_time).cast("double") / delta_seconds)
    r2 = right.withColumn("__rt", F.col(right_time).cast("double")).withColumn(
        "__b", b_r.cast("long")
    )
    b_l = F.floor(F.col(left_time).cast("double") / delta_seconds).cast("long")
    l2 = left.withColumn("__lt", F.col(left_time).cast("double")).withColumn(
        "__b", F.explode(F.array(b_l - 1, b_l))
    )
    joined = l2.join(r2, [key, "__b"]).drop("__b")
    return joined.filter(
        (F.col("__rt") >= F.col("__lt") - delta_seconds)
        & (F.col("__rt") < F.col("__lt"))
    ).drop("__lt", "__rt")
