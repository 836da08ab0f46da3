"""vector_db_setup_spark — PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the query and
data-processing capabilities of the reference repo
``dangni02/vector-db-setup`` (a pgvector + FEVER RAG workload), extended
with the operators a large-scale training-data pipeline needs:
deduplication, similarity search, multimodal columns, and text analysis.

Design stance (SURVEY.md §7):
- DataFrame/SQL declarative plans; Catalyst + Tungsten pick physical
  strategies. No RDDs in the hot path.
- Vector math as native column expressions (``zip_with`` + ``aggregate``,
  whole-stage-codegen friendly); Arrow-batched pandas UDFs only where
  built-ins can't express the semantics.
- Exact KNN is ``orderBy(distance).limit(k)`` → TakeOrderedAndProject
  (per-partition heaps, no full shuffle) — the Spark analogue of the
  reference's ``ORDER BY embedding <-> q LIMIT k``
  (reference: fever_multi_agent.py:67-75).
- Scale path: broadcast small sides, LSH/IVF pre-bucketing instead of
  cross joins, AQE on everywhere.
"""

from vector_db_setup_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
