from stockify_spark.operators.filters import compare, filter_rows, selection_vector
from stockify_spark.operators.aggregates import global_agg, group_agg
from stockify_spark.operators.windows import (
    row_window,
    sliding_agg,
    moving_average,
    rolling_min,
    rolling_max,
)
from stockify_spark.operators.sorts import top_k, top_k_per_group, range_scan

__all__ = [
    "compare",
    "filter_rows",
    "selection_vector",
    "global_agg",
    "group_agg",
    "row_window",
    "sliding_agg",
    "moving_average",
    "rolling_min",
    "rolling_max",
    "top_k",
    "top_k_per_group",
    "range_scan",
]
