from stockify_spark.sources.io import TABLES, load_table, load_tables, register_views
from stockify_spark.sources.fixtures import stocks_ramp, stocks_rand

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "stocks_ramp",
    "stocks_rand",
]
