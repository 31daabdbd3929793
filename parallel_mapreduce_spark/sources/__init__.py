from parallel_mapreduce_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    read_text_lines,
    register_views,
)

__all__ = ["TABLES", "load_table", "read_text_lines", "register_views"]
