from vector_db_setup_spark.plans.inspect import (
    executed_plan,
    has_broadcast_join,
    has_partition_filter,
    has_take_ordered,
    n_exchanges,
)

__all__ = [
    "executed_plan",
    "has_broadcast_join",
    "has_partition_filter",
    "has_take_ordered",
    "n_exchanges",
]
