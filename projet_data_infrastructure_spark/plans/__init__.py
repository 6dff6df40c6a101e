from projet_data_infrastructure_spark.plans.registry import (
    QuerySpec,
    all_specs,
    oracle_sql_map,
    queries_map,
)

__all__ = ["QuerySpec", "all_specs", "oracle_sql_map", "queries_map"]
