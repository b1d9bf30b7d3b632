"""Round-8 extension wave 41: LTTB downsampling.

Largest-Triangle-Three-Buckets (Steinarsson 2013) — the standard
visual downsampler: keep the first and last points, split the
interior into equal buckets, and from each bucket keep the point
forming the largest triangle with the PREVIOUSLY KEPT point and the
NEXT bucket's centroid. The previous-point dependence makes the
selection sequential — applyInPandas territory — and the oracle
steps it as a recursive CTE whose per-step argmax is an ANTI-JOIN
("no candidate in this bucket beats me"), because SQL recursion
forbids aggregates in the recursive term.

Geometry pinned to exact inputs: x is the integer position, bucket
centroids round their y-sum at 6dp, and the triangle area
|(ax-cx)(by-ay) - (ax-bx)(cy-ay)| is evaluated with identical
parenthesization on both faces, so argmax decisions are identical
doubles deciding identical comparisons.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_N = 302  # points used per series: first + 300 interior + last
_BK = 10  # bucket width
_NB = 30  # interior buckets

_LTTB_SQL = f"""
WITH RECURSIVE
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS pos
  FROM events),
pts AS (
  SELECT event_type, pos, value FROM ranked WHERE pos <= {_N}
    AND event_type IN (SELECT event_type FROM ranked
                       GROUP BY 1 HAVING COUNT(*) >= {_N})),
cent AS (
  SELECT event_type, (pos - 2) // {_BK} + 1 AS b,
         AVG(pos) AS cx0, ROUND(SUM(value), 6) / {_BK} AS cy0
  FROM pts WHERE pos BETWEEN 2 AND {_N - 1}
  GROUP BY 1, 2),
cand AS (
  SELECT p.event_type, (p.pos - 2) // {_BK} + 1 AS b, p.pos AS x, p.value AS y,
         CASE WHEN (p.pos - 2) // {_BK} + 1 = {_NB}
              THEN {_N} ELSE c.cx0 END AS cx,
         CASE WHEN (p.pos - 2) // {_BK} + 1 = {_NB}
              THEN (SELECT l.value FROM pts l
                    WHERE l.event_type = p.event_type AND l.pos = {_N})
              ELSE c.cy0 END AS cy
  FROM pts p LEFT JOIN cent c
    ON c.event_type = p.event_type AND c.b = (p.pos - 2) // {_BK} + 2
  WHERE p.pos BETWEEN 2 AND {_N - 1}),
r AS (
  SELECT event_type, 0 AS k, 1 AS x, value AS y
  FROM pts WHERE pos = 1
  UNION ALL
  SELECT r.event_type, r.k + 1, c1.x, c1.y
  FROM r
  JOIN cand c1 ON c1.event_type = r.event_type AND c1.b = r.k + 1
  LEFT JOIN cand c2 ON c2.event_type = c1.event_type AND c2.b = c1.b
    AND (abs((r.x - c2.cx) * (c2.y - r.y) - (r.x - c2.x) * (c2.cy - r.y))
         > abs((r.x - c1.cx) * (c1.y - r.y) - (r.x - c1.x) * (c1.cy - r.y))
      OR (abs((r.x - c2.cx) * (c2.y - r.y) - (r.x - c2.x) * (c2.cy - r.y))
          = abs((r.x - c1.cx) * (c1.y - r.y) - (r.x - c1.x) * (c1.cy - r.y))
          AND c2.x < c1.x))
  WHERE c2.x IS NULL AND r.k < {_NB})
SELECT event_type, CAST(x AS BIGINT) AS pos, y AS value FROM r
UNION ALL
SELECT event_type, CAST(pos AS BIGINT) AS pos, value FROM pts
WHERE pos = {_N}
"""


@register("window_lttb", _LTTB_SQL)
def window_lttb(spark, sf_dir):
    """LTTB downsample of each event-type series: first 302 points
    (event_id order) reduced to 32 — endpoints plus the
    max-triangle point of each of 30 ten-point buckets. Selection
    runs left to right because each bucket's triangle is anchored on
    the previous SELECTION, not the previous bucket — shape
    preservation (spikes survive, plateaus compress) is pinned in
    tests/test_ext52.py against an independent reimplementation and
    a constructed spike series.

    Scale shape: one shuffle on the series key, then a per-group
    numpy loop over the bucket sequence — O(points) per series, two
    scalars of carried state. Dashboards downsample millions of
    series; each is an independent group, the classic applyInPandas
    fan-out (EMA/Kalman/DTW family)."""
    import numpy as np
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")

    def lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id").head(_N)
        if len(pdf) < _N:
            return pd.DataFrame({"event_type": [], "pos": [], "value": []}).astype(
                {"event_type": str, "pos": "int64", "value": float}
            )
        y = pdf["value"].to_numpy()
        t = pdf["event_type"].iloc[0]
        out_pos, out_val = [1], [y[0]]
        px, py = 1.0, y[0]
        for b in range(1, _NB + 1):
            lo = 2 + (b - 1) * _BK  # 1-based positions lo..lo+9
            if b < _NB:
                nlo = lo + _BK
                cx = float(np.mean(np.arange(nlo, nlo + _BK)))
                cy = round(float(np.sum(y[nlo - 1 : nlo - 1 + _BK])), 6) / _BK
            else:
                cx, cy = float(_N), y[_N - 1]
            best, bx, by = -1.0, None, None
            for x in range(lo, lo + _BK):
                yy = y[x - 1]
                area = abs((px - cx) * (yy - py) - (px - x) * (cy - py))
                if area > best:
                    best, bx, by = area, x, yy
            out_pos.append(bx)
            out_val.append(by)
            px, py = float(bx), by
        out_pos.append(_N)
        out_val.append(y[_N - 1])
        return pd.DataFrame(
            {"event_type": t, "pos": out_pos, "value": out_val}
        )

    return ev.groupBy("event_type").applyInPandas(
        lttb, schema="event_type string, pos long, value double"
    )
