"""Round-8 extension wave 33: Dynamic Time Warping distance.

DTW (Sakoe & Chiba 1978) — the elastic distance between a series and
a template that tolerates local time stretching: D(i,j) = |x_i - t_j|
+ min(D(i-1,j), D(i,j-1), D(i-1,j-1)). Spark has no warping-distance
primitive, and the DP is inherently sequential per series — exactly
the custom-stateful-operator case SURVEY §2 routes to applyInPandas
(the EMA/Kalman/ADX precedent). The oracle is the repo's strongest
recursion form yet: a recursive CTE that steps the DP CELL BY CELL
in row-major order, carrying the growing current row and the
completed previous row as DOUBLE[] state — 24x8 = 192 recursion
steps per series, every add in the same order as the numpy loop, so
the match is bit-level before the final rounding.

Template and prefix length are pinned (8-point triangle wave, first
24 values per event type); template ordinates are exactly binary-
representable (x.0 / x.5) so the decimal literals parse to identical
doubles in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_N = 24
_TPL = [10.0, 12.5, 15.0, 12.5, 10.0, 7.5, 5.0, 7.5]
_J = len(_TPL)

_TPL_SQL = "[" + ", ".join(str(v) for v in _TPL) + "]::DOUBLE[]"

_DTW_SQL = f"""
WITH RECURSIVE
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM events),
series AS (
  SELECT event_type, list(value ORDER BY rn) AS xs
  FROM ranked WHERE rn <= {_N}
  GROUP BY 1 HAVING COUNT(*) = {_N}),
dtw AS (
  SELECT event_type, xs, 1 AS i, 1 AS j,
         [abs(xs[1] - ({_TPL_SQL})[1])] AS cur,
         CAST([] AS DOUBLE[]) AS prev
  FROM series
  UNION ALL
  SELECT event_type, xs, ni, nj,
         CASE WHEN nj = 1 THEN [nd] ELSE list_append(cur, nd) END AS cur,
         CASE WHEN nj = 1 THEN cur ELSE prev END AS prev
  FROM (
    SELECT event_type, xs, ni, nj, cur, prev,
           abs(xs[ni] - ({_TPL_SQL})[nj])
           + CASE WHEN ni = 1 THEN cur[nj - 1]
                  WHEN nj = 1 THEN cur[1]
                  ELSE least(prev[nj], prev[nj - 1], cur[nj - 1])
             END AS nd
    FROM (
      SELECT event_type, xs, cur, prev, i, j,
             CASE WHEN j = {_J} THEN i + 1 ELSE i END AS ni,
             CASE WHEN j = {_J} THEN 1 ELSE j + 1 END AS nj
      FROM dtw WHERE NOT (i = {_N} AND j = {_J})
    )
  )
)
SELECT event_type, CAST({_N} AS BIGINT) AS n_used,
       ROUND(cur[{_J}], 6) AS dtw
FROM dtw WHERE i = {_N} AND j = {_J}
"""


@register("window_dtw", _DTW_SQL)
def window_dtw(spark, sf_dir):
    """DTW distance from each event-type's first 24 values (event_id
    order) to the pinned 8-point triangle template. One shuffle on
    event_type, then a per-group numpy DP inside applyInPandas —
    O(N*J) per series, no state wider than two DP rows. The DP loop
    adds |x_i - t_j| to a 3-way min in row-major order, the exact
    op-for-op schedule of the oracle's cell-stepping recursive CTE.

    Scale shape: series parallelism. A 100 TB deployment warps
    millions of (series, template) pairs; each is an independent
    group, the template is a broadcast-literal, and the per-group
    memory is 2 DP rows — the same layout as the EMA/Kalman
    recursions. For long series the Sakoe-Chiba band (restrict
    |i*J/N - j| <= w) drops the per-pair cost to O(N*w) inside the
    same UDF without touching the plan."""
    import numpy as np
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    tpl = np.array(_TPL)

    def dtw_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id").head(_N)
        if len(pdf) < _N:
            return pd.DataFrame(
                {"event_type": [], "n_used": [], "dtw": []}
            ).astype({"event_type": str, "n_used": "int64", "dtw": float})
        xs = pdf["value"].to_numpy()
        prev = None
        for i in range(_N):
            cur = []
            for j in range(_J):
                c = abs(xs[i] - tpl[j])
                if i == 0 and j == 0:
                    d = c
                elif i == 0:
                    d = c + cur[j - 1]
                elif j == 0:
                    d = c + prev[0]
                else:
                    d = c + min(prev[j], prev[j - 1], cur[j - 1])
                cur.append(d)
            prev = cur
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_used": [_N],
                "dtw": [prev[-1]],
            }
        )

    res = ev.groupBy("event_type").applyInPandas(
        dtw_group, schema="event_type string, n_used long, dtw double"
    )
    return res.select(
        "event_type", "n_used", F.round("dtw", 6).alias("dtw")
    )
