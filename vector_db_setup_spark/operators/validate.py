"""Data-quality validation — declarative contracts checked in ONE pass.

The ingestion-side guard a 100 TB pipeline runs before landing a batch
(the reference trusts its restored dump blindly; `setup.sh:73-77`).
Deequ-shaped but deliberately minimal: a rule list compiles to a SINGLE
aggregation over the frame — every rule contributes one conditional-sum
(or count-distinct) slot, partials combine map-side, and the driver
receives one row regardless of input size. No per-rule scans, no
Python in the row path.

Rules (each a plain dict, so contracts can live in config):

  {"rule": "not_null",  "col": c}
  {"rule": "unique",    "col": c}                  # exact, adds a distinct agg
  {"rule": "in_range",  "col": c, "lo": x, "hi": y}    # null = violation
  {"rule": "matches",   "col": c, "pattern": rx}       # null = violation
  {"rule": "in_set",    "col": c, "allowed": [...]}    # null = violation
  {"rule": "min_rows",  "n": k}

`validate` returns the per-rule report DataFrame; `enforce` raises
ValueError with the failing rules when any rule exceeds its
`max_violations` (default 0) — the land-or-abort gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _violation_expr(rule: dict):
    """Column expression: 1 when the row VIOLATES the rule, else 0."""
    kind = rule["rule"]
    if kind == "not_null":
        return F.when(F.col(rule["col"]).isNull(), 1).otherwise(0)
    if kind == "in_range":
        c = F.col(rule["col"])
        ok = c.isNotNull() & (c >= rule["lo"]) & (c <= rule["hi"])
        return F.when(ok, 0).otherwise(1)
    if kind == "matches":
        c = F.col(rule["col"])
        ok = c.isNotNull() & c.rlike(rule["pattern"])
        return F.when(ok, 0).otherwise(1)
    if kind == "in_set":
        c = F.col(rule["col"])
        ok = c.isNotNull() & c.isin(*rule["allowed"])
        return F.when(ok, 0).otherwise(1)
    raise ValueError(f"unknown rule kind: {kind}")


def _rule_name(rule: dict) -> str:
    kind = rule["rule"]
    if kind == "min_rows":
        return f"min_rows({rule['n']})"
    name = f"{kind}({rule['col']}"
    if kind == "in_range":
        name += f",{rule['lo']},{rule['hi']}"
    elif kind == "matches":
        name += f",{rule['pattern']}"
    elif kind == "in_set":
        name += ",{" + ",".join(map(str, rule["allowed"])) + "}"
    return name + ")"


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Check every rule in one aggregation pass; returns a report
    DataFrame (rule string, violations long, n_rows long, passed bool)
    with one row per rule, in rule order.

    `unique` rules add a count-distinct slot each; Spark plans multiple
    distinct aggregates with an expand (one extra exchange per distinct
    column) — exact by design here, since a near-unique key is exactly
    the corruption a contract must catch. Everything else is a
    conditional partial-sum on the single scan.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    names: list[str] = []
    for i, rule in enumerate(rules):
        names.append(_rule_name(rule))
        if rule["rule"] == "min_rows":
            aggs.append(F.lit(None).cast("long").alias(f"__v{i}"))
        elif rule["rule"] == "unique":
            aggs.append(
                F.countDistinct(F.col(rule["col"])).alias(f"__v{i}")
            )
        else:
            aggs.append(F.sum(_violation_expr(rule)).alias(f"__v{i}"))
    row = df.agg(*aggs).limit(1).collect()[0]  # ONE row, any input size
    n = row["__n"]
    out = []
    for i, rule in enumerate(rules):
        if rule["rule"] == "min_rows":
            viol = max(0, rule["n"] - n)
        elif rule["rule"] == "unique":
            # duplicates = rows minus distinct values; a NULL key is
            # not counted by countDistinct, so it surfaces here too
            viol = n - row[f"__v{i}"]
        else:
            viol = row[f"__v{i}"] or 0
        out.append((names[i], int(viol), int(n), int(viol) == 0))
    return df.sparkSession.createDataFrame(
        out, "rule string, violations long, n_rows long, passed boolean"
    )


ROW_LEVEL = {"not_null", "in_range", "matches", "in_set"}


def flag_violations(
    df: DataFrame, rules: list[dict], out_col: str = "_violations"
) -> DataFrame:
    """Append an array column naming every ROW-LEVEL rule the row
    violates (empty array = clean). Pure stateless projection — works
    identically on a batch frame and inside a streaming micro-batch.
    Aggregate-level rules (unique, min_rows) can't be judged per row
    and raise here; check those with `validate`/`enforce`."""
    bad = [r for r in rules if r["rule"] not in ROW_LEVEL]
    if bad:
        raise ValueError(
            "row-level flagging can't evaluate aggregate rules: "
            + ", ".join(_rule_name(r) for r in bad)
        )
    if out_col in df.columns:
        # withColumn would silently REPLACE it — and quarantine_split
        # then drops it from the clean half, destroying caller data
        raise ValueError(
            f"input already has a column named {out_col!r}; pass a "
            "different out_col"
        )
    names = [
        F.when(_violation_expr(r) == 1, F.lit(_rule_name(r)))
        for r in rules
    ]
    # array() of whens -> compact away the nulls of satisfied rules
    arr = F.filter(F.array(*names), lambda x: x.isNotNull())
    return df.withColumn(out_col, arr)


def quarantine_split(
    df: DataFrame, rules: list[dict]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) by the row-level rules: clean rows drop the
    flag column; quarantined rows keep `_violations` naming what failed
    — the per-record ingestion gate (land clean, park dirty for triage)
    that `enforce`'s all-or-nothing contract is too coarse for."""
    flagged = flag_violations(df, rules)
    clean = flagged.filter(F.size("_violations") == 0).drop("_violations")
    dirty = flagged.filter(F.size("_violations") > 0)
    return clean, dirty


def enforce(df: DataFrame, rules: list[dict], max_violations: int = 0) -> DataFrame:
    """Land-or-abort gate: raise ValueError naming every rule whose
    violation count exceeds `max_violations`; otherwise return `df`
    unchanged (chainable before a write)."""
    report = validate(df, rules).limit(len(rules)).collect()
    failing = [
        f"{r['rule']}: {r['violations']}/{r['n_rows']}"
        for r in report
        if r["violations"] > max_violations
    ]
    if failing:
        raise ValueError(
            "data-quality contract failed: " + "; ".join(failing)
        )
    return df
