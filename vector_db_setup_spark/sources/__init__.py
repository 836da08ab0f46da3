from vector_db_setup_spark.sources.registry import (
    TABLES,
    load_table,
    load_tables,
    register_views,
    table_exists,
)

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "table_exists"]
