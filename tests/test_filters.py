"""Filter invariants (SURVEY §5.3 property-based plan, fixed-seed
variant): complement partition, selection-vector/compaction
agreement, comparator algebra completeness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stockify_spark.operators import compare, filter_rows, selection_vector
from stockify_spark.sources.io import load_table


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").cache()
    yield df
    # unpersist, or the CacheManager substitutes InMemoryRelation for
    # this parquet scan in every later test's plan (test_plans asserts
    # on PushedFilters, which a cached scan doesn't have)
    df.unpersist()


@pytest.mark.parametrize("op,inverse", [("ge", "lt"), ("gt", "le"), ("eq", "ne")])
def test_complement_partition(lineitem, op, inverse):
    total = lineitem.count()
    p = filter_rows(lineitem, compare("l_quantity", op, 25.0)).count()
    q = filter_rows(lineitem, compare("l_quantity", inverse, 25.0)).count()
    assert p + q == total
    assert 0 < p < total  # literal chosen at selectivity strictly inside (0,1)


def test_selection_vector_agrees_with_compaction(lineitem):
    pred = compare("l_extendedprice", "ge", 30000.0)
    flagged = selection_vector(lineitem, pred)
    assert flagged.count() == lineitem.count()  # uncompacted
    assert flagged.filter(F.col("flag")).count() == lineitem.filter(pred).count()


def test_conjunction_matches_intersection(lineitem):
    a = compare("l_quantity", "ge", 25.0)
    b = compare("l_discount", "ge", 0.05)
    both = filter_rows(lineitem, a, b).count()
    assert both == lineitem.filter(a & b).count()
    assert both <= min(lineitem.filter(a).count(), lineitem.filter(b).count())


def test_unknown_comparator_rejected():
    with pytest.raises(ValueError):
        compare("x", "like", 1)
