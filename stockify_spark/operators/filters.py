"""Filter / predicate operators (SURVEY §2.2, F1-F6).

The reference ships six CUDA kernels, all ``column >= literal``
(stockify.cu:89-122), with the full comparator algebra only *declared*
in a comment (stockify.cu:78-81). Here the whole algebra is real:
every comparator plus arbitrary AND/OR/NOT composition, as plain
``Column`` expressions so Catalyst pushes them into the Parquet scan
(``PushedFilters`` in ``.explain``) — at 100 TB the filter runs in
the reader, not after it.

Two output surfaces, mirroring the reference's two shapes:
  * ``filter_rows`` — compacted rows (the SQL-standard surface);
  * ``selection_vector`` — one boolean flag per input row, the
    reference's uncompacted ``bool* results`` (stockify.cu:89-92).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The comparator algebra declared at stockify.cu:78-81.
COMPARATORS: dict[str, Callable[[Column, object], Column]] = {
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
    "gt": lambda c, v: c > v,
    "ge": lambda c, v: c >= v,
    "lt": lambda c, v: c < v,
    "le": lambda c, v: c <= v,
}


def compare(column: str | Column, op: str, value: object) -> Column:
    """Build ``column <op> value`` for op in eq/ne/gt/ge/lt/le."""
    if op not in COMPARATORS:
        raise ValueError(f"unknown comparator {op!r}; choose from {sorted(COMPARATORS)}")
    col = F.col(column) if isinstance(column, str) else column
    return COMPARATORS[op](col, value)


def filter_rows(df: DataFrame, *predicates: Column) -> DataFrame:
    """AND-conjunction of predicates, compacted output.

    The reference's only composition is one hard-coded AND kernel
    (filterStocksByHighPriceAndLowPrice, stockify.cu:119-122);
    arbitrary conjunction is the generalization it comments about
    ("filter1, filter2, filter3", stockify.cu:80).
    """
    out = df
    for p in predicates:
        out = out.filter(p)
    return out


def selection_vector(df: DataFrame, predicate: Column, flag: str = "flag") -> DataFrame:
    """Uncompacted filter: every input row plus a boolean flag column.

    Matches the reference's selection-vector semantics (one bool per
    row, rows never compacted, stockify.cu:89-92, 210).
    """
    return df.withColumn(flag, predicate)
