from vector_db_setup_spark.functions.vector import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_distance_sq,
    l2_norm,
    random_vector,
)

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_distance_sq",
    "l2_norm",
    "random_vector",
]
