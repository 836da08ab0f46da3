"""Named query inventory — the driver-facing contract.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string that DuckDB runs on the same
parquet fixtures. Column names/aliases MUST match between the two: the
driver sorts columns by name and value-hashes order-insensitively.

Float parity policy: every derived float (sum/avg/distance/similarity) is
rounded to 6 decimals on BOTH sides, and all vector math is computed in
double precision, so engine-level summation-order differences (Spark
partial aggregation vs DuckDB single-node) vanish below the rounding
threshold.

Determinism policy: every LIMIT is preceded by a total ORDER BY (ties
broken on a key column) so top-k sets are unambiguous in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_db_setup_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
)
from vector_db_setup_spark.operators.knn import knn_topk
from vector_db_setup_spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """Fetch one embedding to use as the KNN query vector.

    This is the query *parameter* (the reference embeds the claim text
    client-side and ships the vector as a bind parameter,
    fever_multi_agent.py:64,71) — a 1-row lookup, not a data-path collect.
    """
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


# SQL fragment: the same query vector, DuckDB-side.
_QVEC_SQL = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"


# ---------------------------------------------------------------------------
# Vector / KNN queries (SURVEY.md §2.9)
# ---------------------------------------------------------------------------


@register(
    "knn_l2_flagship",
    f"""
    SELECT d.doc_id AS doc_id,
           d.text   AS content,
           round(list_distance(e.embedding::DOUBLE[], {_QVEC_SQL}), 6) AS distance
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE d.text IS NOT NULL AND length(d.text) > 0
    ORDER BY list_distance(e.embedding::DOUBLE[], {_QVEC_SQL}) ASC, d.doc_id ASC
    LIMIT 5
    """,
)
def knn_l2_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference query: exact L2 top-5 over the vector-augmented table
    (fever_multi_agent.py:67-75), with the Python-truthiness content
    filter (:81). fever_documents is emulated by documents ⋈ embeddings
    (broadcast hash join — embeddings is the dim side at fixture scale;
    at 100 TB the vector column lives *in* the doc table, no join at all).

    Physical plan: scan → join → distance expr → TakeOrderedAndProject.
    No Exchange on the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    joined = docs.join(
        embs, docs.doc_id == embs.vec_id, "inner"
    ).filter(F.col("text").isNotNull() & (F.length("text") > 0))
    knn = knn_topk(joined, "embedding", qv, k=5, metric="l2")
    return (
        knn.orderBy(F.col("distance").asc(), F.col("doc_id").asc())
        .select(
            "doc_id",
            F.col("text").alias("content"),
            F.round("distance", 6).alias("distance"),
        )
    )


@register(
    "knn_cosine",
    f"""
    SELECT e.vec_id AS vec_id,
           round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], {_QVEC_SQL}), 6)
               AS distance
    FROM embeddings e
    ORDER BY distance ASC, e.vec_id ASC
    LIMIT 10
    """,
)
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-distance top-10 (pgvector ``<=>`` analogue)."""
    embs = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    knn = knn_topk(embs, "embedding", qv, k=10, metric="cosine")
    return (
        knn.withColumn("distance", F.round("distance", 6))
        .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .select("vec_id", "distance")
    )


@register(
    "knn_dot",
    f"""
    SELECT e.vec_id AS vec_id,
           round(list_inner_product(e.embedding::DOUBLE[], {_QVEC_SQL}), 6) AS score
    FROM embeddings e
    ORDER BY list_inner_product(e.embedding::DOUBLE[], {_QVEC_SQL}) DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def knn_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-inner-product top-10 (pgvector ``<#>`` analogue)."""
    embs = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    from vector_db_setup_spark.functions.vector import vector_literal

    scored = embs.withColumn("score", dot_product(F.col("embedding"), vector_literal(qv)))
    return (
        scored.orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("score", 6).alias("score"))
    )


@register(
    "batch_knn",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
        FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
        FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, round(dist, 6) AS distance
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY dist ASC, vec_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def batch_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch KNN join (SURVEY.md §2.3 J2): top-3 neighbors for each of 5
    query vectors. Queries broadcast; corpus un-shuffled until the
    per-query rank (which moves only Q×N scored rows — at scale, ANN
    pre-bucketing shrinks that product first)."""
    embs = load_table(spark, sf_dir, "embeddings")
    qs = embs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    pairs = embs.crossJoin(F.broadcast(qs))
    scored = pairs.withColumn("dist", l2_distance(F.col("embedding"), F.col("qvec")))
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "vec_id", F.round("dist", 6).alias("distance"))
    )


# ---------------------------------------------------------------------------
# Relational inventory over the star schema (SURVEY.md §2.3 J4, §2.4)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                                        AS sum_charge,
           round(avg(l_quantity), 6)                                    AS avg_qty,
           round(avg(l_extendedprice), 6)                               AS avg_price,
           round(avg(l_discount), 6)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical partial-agg test.
    Map-side combine reduces each partition to ≤6 groups before the
    shuffle — the plan that keeps working at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "top_customers",
    """
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS order_count
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-hash join (customer is the small dim) + agg + top-k."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


@register(
    "regional_revenue",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region, nation
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema snowflake join chain (TPC-H Q5 shape). All three dims
    broadcast; the fact table is the only large operand and never
    shuffles for the joins — only the final 2-column agg shuffles."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("region", "nation")
    )


@register(
    "orders_by_month",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1, 2
    ORDER BY order_month, o_orderstatus
    """,
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-truncated rollup (date/time scalar functions, SURVEY.md §2.8
    fixture extension)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("order_month", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Reference-closure scalar/agg behaviors (SURVEY.md §2.4, §2.8)
# ---------------------------------------------------------------------------


@register("doc_count", "SELECT count(*) AS n FROM documents")
def doc_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) sanity check (reference: test_connection.py:50)."""
    return load_table(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n"))


@register(
    "doc_sample",
    """
    SELECT doc_id, substr(text, 1, 80) AS preview, lang, source
    FROM documents ORDER BY doc_id LIMIT 3
    """,
)
def doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT-3 sample with 80-char truncation (reference:
    test_connection.py:55-63 — made deterministic with an ORDER BY)."""
    return (
        load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(3)
        .select(
            "doc_id",
            F.substring("text", 1, 80).alias("preview"),
            "lang",
            "source",
        )
    )


@register(
    "majority_vote",
    """
    SELECT user_id, event_type AS voted
    FROM (
        SELECT user_id, event_type, count(*) AS c,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type ASC) AS rn
        FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority vote / mode (reference judge A2: `max(set(labels),
    key=labels.count)`, fever_multi_agent.py:166-176) — per-user modal
    event type, ties broken lexicographically for determinism."""
    ev = load_table(spark, sf_dir, "events")
    counted = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("c").desc(), F.col("event_type").asc()
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("voted"))
        .orderBy("user_id")
    )


@register(
    "substring_accuracy",
    """
    SELECT round(avg(CASE WHEN instr(upper(text), upper(lang)) > 0
                          THEN 1.0 ELSE 0.0 END), 6) AS accuracy,
           count(*) AS total
    FROM documents
    """,
)
def substring_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-match accuracy (reference scorer A3:
    ``ground_truth in predicted.upper()``, fever_multi_agent.py:275-296)
    re-expressed over the fixtures: fraction of docs whose text contains
    their own lang code, case-insensitively."""
    d = load_table(spark, sf_dir, "documents")
    hit = F.when(F.instr(F.upper("text"), F.upper("lang")) > 0, 1.0).otherwise(0.0)
    return d.agg(
        F.round(F.avg(hit), 6).alias("accuracy"),
        F.count(F.lit(1)).alias("total"),
    )
