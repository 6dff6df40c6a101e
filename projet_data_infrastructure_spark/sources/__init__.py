from projet_data_infrastructure_spark.sources.readers import (
    TABLES,
    load_star,
    read_table,
)

__all__ = ["TABLES", "load_star", "read_table"]
