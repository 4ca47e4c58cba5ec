from owl_etl_spark.sources.readers import (
    TPCH_TABLES,
    load_star,
    read_events,
    read_fic_json,
    read_skip_list,
    read_table,
)

__all__ = [
    "TPCH_TABLES",
    "load_star",
    "read_events",
    "read_fic_json",
    "read_skip_list",
    "read_table",
]
