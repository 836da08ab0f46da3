from vector_db_setup_spark.operators.knn import batch_knn_join, knn_topk

__all__ = ["batch_knn_join", "knn_topk"]
