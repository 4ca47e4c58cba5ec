from owl_etl_spark.operators.latest import latest_per_key, upsert_by_recency
from owl_etl_spark.operators.sessionize import sessionize
from owl_etl_spark.operators.quality import anti_filter, repair_structure, split_by_predicate

__all__ = [
    "anti_filter",
    "latest_per_key",
    "repair_structure",
    "sessionize",
    "split_by_predicate",
    "upsert_by_recency",
]
