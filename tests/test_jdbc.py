"""JDBC interop (sources/jdbc.py) — SURVEY §2.1 S1's Postgres mapping.

End-to-end against embedded Derby (the JDBC engine on Spark's default
classpath; in-memory DB lives in the same local-mode JVM Spark's scans
run in), plus a reader-contract test pinning the exact options a
production driver (e.g. Postgres) would receive.
"""

from __future__ import annotations

import pytest

from vector_db_setup_spark.sources.jdbc import (
    ingest_jdbc_to_parquet,
    load_table_jdbc,
)

URL = "jdbc:derby:memory:jdbctest;create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_table(spark):
    """Create + fill a Derby table through plain java.sql via the
    gateway (no pyspark JDBC write — the READ path is under test)."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    try:
        st.executeUpdate("DROP TABLE people")
    except Exception:
        pass
    st.executeUpdate(
        "CREATE TABLE people (id INT PRIMARY KEY, name VARCHAR(32), "
        "age INT)"
    )
    ps = conn.prepareStatement("INSERT INTO people VALUES (?, ?, ?)")
    for i in range(100):
        ps.setInt(1, i)
        ps.setString(2, f"name{i:03d}")
        ps.setInt(3, 18 + (i * 7) % 60)
        ps.addBatch()
    ps.executeBatch()
    st.close()
    conn.close()
    return "people"


def test_jdbc_roundtrip_and_partitioned_read(spark, derby_table):
    df = load_table_jdbc(
        spark,
        URL,
        derby_table,
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
        driver=DRIVER,
    )
    # the partitioned read issues 4 range-disjoint remote queries
    assert df.rdd.getNumPartitions() == 4
    rows = sorted((r["ID"], r["NAME"], r["AGE"]) for r in df.collect())
    assert len(rows) == 100
    assert rows[7] == (7, "name007", 18 + 49 % 60)


def test_jdbc_filter_pushdown_reaches_remote_sql(spark, derby_table):
    from pyspark.sql import functions as F

    df = load_table_jdbc(spark, URL, derby_table, driver=DRIVER).filter(
        F.col("age") > 50
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "AGE" in plan, plan
    got = df.collect()
    assert got and all(r["AGE"] > 50 for r in got)


def test_jdbc_subquery_and_ingest_to_parquet(spark, derby_table, tmp_path):
    out = str(tmp_path / "people_pq")
    ingest_jdbc_to_parquet(
        spark,
        URL,
        "(SELECT id, age FROM people WHERE age < 40) t",
        out,
        driver=DRIVER,
    )
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert set(c.upper() for c in back.columns) == {"ID", "AGE"}
    assert back.filter("AGE >= 40").count() == 0


def test_jdbc_partition_args_all_or_nothing(spark):
    with pytest.raises(ValueError, match="ALL of partition_column"):
        load_table_jdbc(
            spark, URL, "people", partition_column="id", num_partitions=4
        )


class _FakeReader:
    """DataFrameReader-shaped probe capturing the option stream."""

    def __init__(self):
        self.fmt = None
        self.opts = {}

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        return self.opts


def test_jdbc_reader_contract_for_production_driver(spark):
    """Exactly the options a real Postgres pull would send: url,
    dbtable, the four partitioning options (stringified), fetchsize,
    driver class, credentials, and vendor extras."""
    fake = _FakeReader()
    opts = load_table_jdbc(
        spark,
        "jdbc:postgresql://db:5432/fever",
        "public.claims",
        partition_column="claim_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
        fetch_size=5_000,
        driver="org.postgresql.Driver",
        user="u",
        password="p",
        options={"ssl": "true"},
        reader=fake,
    )
    assert fake.fmt == "jdbc"
    assert opts == {
        "url": "jdbc:postgresql://db:5432/fever",
        "dbtable": "public.claims",
        "fetchsize": "5000",
        "partitionColumn": "claim_id",
        "lowerBound": "0",
        "upperBound": "1000000",
        "numPartitions": "64",
        "driver": "org.postgresql.Driver",
        "user": "u",
        "password": "p",
        "ssl": "true",
    }


def test_jdbc_write_roundtrip(spark, tmp_path):
    """write_table_jdbc -> load_table_jdbc round trip against Derby:
    curated results published back to the database other consumers of
    the reference still read."""
    from vector_db_setup_spark.sources.jdbc import write_table_jdbc

    src = spark.createDataFrame(
        [(i, f"doc{i:03d}", float(i) / 4) for i in range(40)],
        "doc_id int, name string, score double",
    )
    write_table_jdbc(
        src,
        URL,
        "curated_out",
        mode="overwrite",
        batch_size=16,
        num_partitions=2,
        driver=DRIVER,
    )
    back = load_table_jdbc(spark, URL, "curated_out", driver=DRIVER)
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in src.collect())
    assert got == want
    # append mode adds rows without dropping
    write_table_jdbc(
        src.filter("doc_id < 5"), URL, "curated_out",
        mode="append", driver=DRIVER,
    )
    assert back.count() == 45
