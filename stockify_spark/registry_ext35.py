"""Round-8 extension wave 24: dynamic-gap session windows.

Spark's session_window accepts a PER-ROW gap expression — the
sessionization rule itself becomes data-dependent (a purchase holds
the session open 30 minutes, other events 10). The session is then
the union of per-event intervals [ts, ts + gap(event)) merged on
overlap, which the fixed-gap gaps-and-islands oracle cannot model:
a long-gap event can bridge a hole PAST a short-gap successor, so
the break test must compare against the RUNNING MAX of prior
interval ends, not the previous event's end. The oracle walks
exactly that recurrence."""

from __future__ import annotations

from stockify_spark.registry import register, _t

_DYN_SQL = """
WITH g AS (
  SELECT user_id, ts, value,
         ts + CASE WHEN event_type = 'purchase' THEN INTERVAL '30 minutes'
                   ELSE INTERVAL '10 minutes' END AS iv_end
  FROM events
),
marked AS (
  SELECT user_id, ts, value, iv_end,
         CASE WHEN MAX(iv_end) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) IS NULL
                   OR ts >= MAX(iv_end) OVER (PARTITION BY user_id ORDER BY ts
                                              ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_new
  FROM g
),
numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sess
  FROM marked
)
SELECT MIN(ts) AS session_start, MAX(iv_end) AS session_end,
       user_id, COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM numbered GROUP BY user_id, sess
"""


@register("stream_session_dynamic", _DYN_SQL)
def stream_session_dynamic(spark, sf_dir):
    """Batch face of dynamic-gap sessionization
    (streaming/windows.session_agg_dynamic; stream==batch pinned in
    tests/test_streaming.py): the oracle's running-max-end walk is
    the interval-union semantics of Spark's dynamic session_window —
    session end is the max of member interval ends, and a new
    session starts only when an event's timestamp reaches PAST every
    prior member's reach. State stays bounded by the watermark in
    the streaming face exactly as with fixed gaps."""
    from stockify_spark.streaming.windows import session_agg_dynamic

    return session_agg_dynamic(_t(spark, sf_dir, "events"))
