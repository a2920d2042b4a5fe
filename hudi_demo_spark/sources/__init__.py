from hudi_demo_spark.sources.readers import (
    csv_source,
    jdbc_source,
    jdbc_subquery_source,
    load_table,
    load_tables,
    register_views,
)
from hudi_demo_spark.sources.datagen import rate_stream_source, trips_datagen

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "csv_source",
    "jdbc_source",
    "jdbc_subquery_source",
    "rate_stream_source",
    "trips_datagen",
]
