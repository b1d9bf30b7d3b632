"""Round-8 extension wave 47: point-in-polygon (ray casting).

The geo-join primitive after radius search (geo_range_join) and k-NN
(geo_knn_suppliers): classify points against a polygon fence. The
even-odd rule (Shimrat 1962's classic ray-casting algorithm): shoot
a horizontal ray from the point and count polygon edges it crosses —
odd means inside. Per point it is a 6-term sum of branch-free edge
tests, so the operator is a map over the point table with the
polygon broadcast as literals; no geometry library, no UDF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

# key-derived synthetic coordinates (the geo_range_join convention)
_LAT = "(({k} * 7919) % 18000) / 100.0 - 90.0"
_LON = "(({k} * 104729) % 36000) / 100.0 - 180.0"

# hexagonal fence in (lon=x, lat=y); every edge has distinct y ends,
# so the straddle test never divides by zero
_POLY = [
    (-60.0, -30.0), (-20.0, -55.0), (40.0, -25.0),
    (55.0, 20.0), (0.0, 45.0), (-45.0, 25.0),
]
_EDGES = [
    (_POLY[i][0], _POLY[i][1], _POLY[(i + 1) % len(_POLY)][0],
     _POLY[(i + 1) % len(_POLY)][1])
    for i in range(len(_POLY))
]

_EDGE_VALUES = ", ".join(
    f"({x1}, {y1}, {x2}, {y2})" for x1, y1, x2, y2 in _EDGES
)

_PIP_SQL = f"""
WITH pts AS (
  SELECT c_custkey, c_nationkey,
         {_LON.format(k='c_custkey')} AS x,
         {_LAT.format(k='c_custkey')} AS y
  FROM customer),
edges(x1, y1, x2, y2) AS (VALUES {_EDGE_VALUES}),
hits AS (
  SELECT p.c_custkey, p.c_nationkey,
         SUM(CASE WHEN (CAST(y1 AS DOUBLE) > p.y)
                       <> (CAST(y2 AS DOUBLE) > p.y)
                   AND p.x < (CAST(x2 AS DOUBLE) - CAST(x1 AS DOUBLE))
                             * (p.y - CAST(y1 AS DOUBLE))
                             / (CAST(y2 AS DOUBLE) - CAST(y1 AS DOUBLE))
                             + CAST(x1 AS DOUBLE)
              THEN 1 ELSE 0 END) AS crossings
  FROM pts p CROSS JOIN edges GROUP BY 1, 2)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(crossings % 2) AS BIGINT) AS n_inside
FROM hits GROUP BY 1
"""


@register("geo_point_in_polygon", _PIP_SQL)
def geo_point_in_polygon(spark, sf_dir):
    """Per-nation census of customers inside the literal hexagonal
    fence, by even-odd ray casting over the key-derived synthetic
    coordinates (the geo_range_join convention — the schema has no
    geography). Ray-cast parity is pinned in tests/test_ext58.py
    against matplotlib-free brute geometry (winding-free convex
    check) plus hand-placed inside/outside probes.

    Scale shape: the polygon is a 6-row literal — the cross join is
    a broadcast of constants, the crossing count is a 6-term
    per-row expression, and the census is one map-side-combinable
    aggregate. A billion points cost one scan; a thousand-vertex
    polygon only widens the per-row term count (production systems
    band polygon edges by y-range to cut that, the same banding idea
    as the latitude join)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    x = ((F.col("c_custkey") * 104729) % 36000) / 100.0 - 180.0
    y = ((F.col("c_custkey") * 7919) % 18000) / 100.0 - 90.0
    pts = cust.select("c_custkey", "c_nationkey", x.alias("x"), y.alias("y"))
    crossings = None
    for x1, y1, x2, y2 in _EDGES:
        straddle = (F.lit(y1) > F.col("y")) != (F.lit(y2) > F.col("y"))
        xcross = F.col("x") < (
            (F.lit(x2) - F.lit(x1))
            * (F.col("y") - F.lit(y1))
            / (F.lit(y2) - F.lit(y1))
            + F.lit(x1)
        )
        term = F.when(straddle & xcross, 1).otherwise(0)
        crossings = term if crossings is None else crossings + term
    hits = pts.select(
        "c_nationkey", (crossings % 2).alias("inside")
    )
    return hits.groupBy(
        F.col("c_nationkey").cast("long").alias("nationkey")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("inside").cast("long").alias("n_inside"),
    )
