"""Skew-aware join: key salting.

AQE's skew-join handling (on in session.py) splits oversized partitions
at runtime and covers most cases. Salting is the explicit fallback for
pathological keys (one key = 30% of a 100 TB fact table) or for
non-AQE-able patterns (skewed aggregation keys):

- fact side: append a random salt in [0, n_salts) to the key;
- dim side: explode each row into all n_salts variants;
- join on (key, salt) — the hot key's rows spread over n_salts tasks.

The dim side grows n_salts×, so salt only the keys that need it
(`hot_keys` restricts the explosion; cold keys join with salt 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot keys spread across `n_salts` sub-partitions.

    With hot_keys=None every key is salted (uniform n_salts× dim
    blow-up); with an explicit hot list only those explode.

    Only inner/left joins are supported: with right/full outer, every
    exploded dim copy that finds no fact match would survive as its own
    output row, duplicating unmatched dim rows n_salts×.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} "
            "(outer-preserved dim rows would duplicate per salt)"
        )
    # withColumn would silently OVERWRITE a caller's __salt column and
    # join on corrupted salts (r13 review pass — same clash class as
    # bloom_probe's reserved names)
    clash = [d for d in (fact, dim) if "__salt" in d.columns]
    if clash:
        raise ValueError(
            "salted_join reserves the column name '__salt'; rename it "
            "on the input first"
        )
    if hot_keys is None:
        fact_s = fact.withColumn(
            "__salt", (F.rand(seed=42) * n_salts).cast("int")
        )
        dim_s = dim.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
        )
    else:
        is_hot = F.col(key).isin(hot_keys)
        fact_s = fact.withColumn(
            "__salt",
            F.when(is_hot, (F.rand(seed=42) * n_salts).cast("int")).otherwise(
                F.lit(0)
            ),
        )
        dim_s = dim.withColumn(
            "__salt",
            F.explode(
                F.when(
                    is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1))
                ).otherwise(F.array(F.lit(0)))
            ),
        )
    return fact_s.join(dim_s, [key, "__salt"], how).drop("__salt")
