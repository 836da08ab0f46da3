"""Bucketed-join shuffle elimination, salted joins, LLM map stage."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_db_setup_spark.operators.llm import llm_map_stage
from vector_db_setup_spark.operators.skew import salted_join
from vector_db_setup_spark.plans.inspect import executed_plan
from vector_db_setup_spark.plans.storage import (
    bucketed_join,
    write_bucketed,
    write_partitioned,
)
from vector_db_setup_spark.sources.registry import load_table


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    # managed tables land in the default warehouse (cwd/spark-warehouse,
    # gitignored); DROP TABLE below removes the data
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    o = load_table(spark, SF_SMOKE, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    write_bucketed(li, "li_b", "orderkey", n_buckets=4)
    write_bucketed(o, "o_b", "orderkey", n_buckets=4)
    # broadcast would hide the point — force the merge path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "li_b", "o_b", "orderkey")
        plan = executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert not re.search(r"Exchange hashpartitioning", plan), (
            "co-bucketed join must not shuffle"
        )
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "ev_part")
    write_partitioned(ev, path, ["event_type"])
    one = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = executed_plan(one)
    assert "PartitionFilters: [isnotnull(event_type" in plan
    total = spark.read.parquet(path).count()
    assert total == ev.count()


def test_salted_join_matches_plain(spark):
    c = load_table(spark, SF_SMOKE, "customer")
    o = load_table(spark, SF_SMOKE, "orders")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    ok = o.withColumnRenamed("o_custkey", "k")
    ck = c.withColumnRenamed("c_custkey", "k")
    salted = (
        salted_join(ok, ck, "k", n_salts=4)
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_join_hot_keys_only(spark):
    c = load_table(spark, SF_SMOKE, "customer").withColumnRenamed("c_custkey", "k")
    o = load_table(spark, SF_SMOKE, "orders").withColumnRenamed("o_custkey", "k")
    hot = [r["k"] for r in o.groupBy("k").count().orderBy(F.desc("count")).limit(3).collect()]
    plain_n = o.join(c, "k").count()
    assert salted_join(o, c, "k", n_salts=4, hot_keys=hot).count() == plain_n


def test_llm_map_stage_deterministic(spark):
    d = load_table(spark, SF_SMOKE, "documents").limit(10)
    out = llm_map_stage(
        d,
        "Claim: {text}\nVerdict?",
        input_cols=["text"],
        output_col="verdict",
    )
    rows = out.collect()
    assert len(rows) == 10
    assert all(
        r["verdict"] in ("SUPPORTS", "REFUTES", "NOT ENOUGH INFO") for r in rows
    )
    # deterministic across runs
    again = {r["doc_id"]: r["verdict"] for r in out.collect()}
    assert {r["doc_id"]: r["verdict"] for r in rows} == again


def test_llm_map_stage_custom_model(spark):
    d = load_table(spark, SF_SMOKE, "documents").limit(5)
    out = llm_map_stage(
        d,
        "{text}",
        input_cols=["text"],
        respond_fn=lambda s: s.str.len().astype(str),
    )
    for r in out.collect():
        assert int(r["completion"]) == len(r["text"])


def test_upsert_partitions_preserves_others(spark, tmp_path):
    from pyspark.sql import functions as F

    from vector_db_setup_spark.sources.ingest import upsert_partitions

    dest = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 30.0), (4, "d3", 40.0)],
        "id long, day string, v double",
    )
    base.write.partitionBy("day").parquet(dest)

    # re-land ONLY d2 with corrected values; d1/d3 must survive untouched
    fix = spark.createDataFrame([(3, "d2", 99.0)], "id long, day string, v double")
    upsert_partitions(fix, dest, ["day"])

    got = {
        (r["id"], r["day"], r["v"])
        for r in spark.read.parquet(dest).collect()
    }
    assert got == {(1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 99.0), (4, "d3", 40.0)}
    # config restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower() == "static"  # session conf untouched: the write uses a per-writer option


def test_upsert_partitions_idempotent_replay(spark, tmp_path):
    from vector_db_setup_spark.sources.ingest import upsert_partitions

    dest = str(tmp_path / "tbl2")
    day = spark.createDataFrame(
        [(1, "d1", 1.0), (2, "d1", 2.0)], "id long, day string, v double"
    )
    upsert_partitions(day, dest, ["day"])
    upsert_partitions(day, dest, ["day"])  # replay must not duplicate
    assert spark.read.parquet(dest).count() == 2


def test_hll_rollup_accuracy_and_merge(spark):
    from pyspark.sql import functions as F

    from tests.conftest import SF_ORACLE
    from vector_db_setup_spark import queries as q
    from vector_db_setup_spark.sources.registry import load_table

    res = q.hll_user_rollup(spark, SF_ORACLE).collect()
    ev = load_table(spark, SF_ORACLE, "events")
    exact_by_day = {
        str(r["day"]): r["n"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_total = ev.select("user_id").distinct().count()
    for r in res:
        if r["scope"] == "day":
            exact = exact_by_day[r["day"]]
        else:
            exact = exact_total
        # HLL standard error ~1.6% at default lgConfigK=12
        assert abs(r["est_users"] - exact) <= max(2, 0.05 * exact), (
            r["scope"], r["day"], r["est_users"], exact,
        )
    assert sum(1 for r in res if r["scope"] == "total") == 1


def test_salted_join_rejects_outer(spark):
    import pytest

    o = spark.createDataFrame([(1, "x")], "k long, v string")
    c = spark.createDataFrame([(1, "y")], "k long, w string")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(o, c, "k", how="right")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(o, c, "k", how="full")


def test_zorder_write_prunes_both_columns(spark, tmp_path):
    """Z-order clustering must keep parquet footer min/max NARROW on the
    SECOND key too: a range filter on col_b overlaps fewer files than a
    plain col_a-sorted layout (where col_b spans everything in every
    file)."""
    import pyarrow.parquet as pq

    from vector_db_setup_spark.plans.storage import write_zordered

    from pyspark.sql import functions as F

    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("a"),
        F.pmod(F.col("id") * 7919, F.lit(n)).alias("b"),  # decorrelated
        (F.col("id") % 97).alias("payload"),
    )
    z_path, lin_path = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(df, z_path, "a", "b", n_files=8)
    (
        df.repartitionByRange(8, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(lin_path)
    )

    def overlap_fraction(path, col, lo, hi):
        import glob

        files = glob.glob(f"{path}/*.parquet")
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            j = next(
                j
                for j in range(md.num_columns)
                if md.row_group(0).column(j).path_in_schema == col
            )
            mins = [
                md.row_group(i).column(j).statistics.min
                for i in range(md.num_row_groups)
            ]
            maxs = [
                md.row_group(i).column(j).statistics.max
                for i in range(md.num_row_groups)
            ]
            if min(mins) <= hi and max(maxs) >= lo:
                hit += 1
        return hit / max(len(files), 1)

    lo, hi = 0, n // 16  # narrow range on b
    z_frac = overlap_fraction(z_path, "b", lo, hi)
    lin_frac = overlap_fraction(lin_path, "b", lo, hi)
    # linear layout: b spans everything in every file -> always 1.0;
    # zorder: only files whose b-range overlaps
    assert lin_frac == 1.0
    assert z_frac < lin_frac

    # and correctness: the clustered copy holds the same rows
    got = sorted(tuple(r) for r in spark.read.parquet(z_path).collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
