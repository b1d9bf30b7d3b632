"""Round-8 extension wave 14: corpus admission ensemble and
traffic-hygiene bot detection.

Both are the REPORTING face of pipeline filtering: not just a keep
bit but the attributed reason (first failing rule, fixed order) —
what an operator of a 100 TB ingest actually needs to debug a
filter's yield. All metrics are rationals of integer counts (the
determinism-by-construction rule); the bot detector keeps gap
moments in integer SECONDS so squared sums stay exact below 2^53
(millisecond gaps would overflow the exact-integer range)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_STOP25_SQL = "('the','a','of','and','to','in','is','that','it','for')"
_STOP25 = ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
_TOKS25 = "string_split_regex(trim(lower(text)), '\\s+')"

_ENSEMBLE_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS25}) AS tok FROM documents
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct,
         CAST(SUM(CASE WHEN tok IN {_STOP25_SQL} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stop
  FROM tok GROUP BY doc_id
),
m AS (
  SELECT doc_id, n_tokens, n_distinct, n_stop,
         ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
         ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_frac
  FROM per_doc
)
SELECT doc_id, n_tokens, stop_ratio, dup_frac,
       CASE WHEN n_tokens < 10 THEN 'too_short'
            WHEN n_tokens > 400 THEN 'too_long'
            WHEN CAST(n_stop AS DOUBLE) / n_tokens < 0.02 THEN 'low_stopwords'
            WHEN 1.0 - CAST(n_distinct AS DOUBLE) / n_tokens > 0.85
              THEN 'too_repetitive'
            ELSE 'ok' END AS reason,
       CASE WHEN n_tokens < 10 THEN FALSE
            WHEN n_tokens > 400 THEN FALSE
            WHEN CAST(n_stop AS DOUBLE) / n_tokens < 0.02 THEN FALSE
            WHEN 1.0 - CAST(n_distinct AS DOUBLE) / n_tokens > 0.85 THEN FALSE
            ELSE TRUE END AS keep
FROM m
"""


@register("pipeline_quality_ensemble", _ENSEMBLE_SQL)
def pipeline_quality_ensemble(spark, sf_dir):
    """Corpus admission ensemble with ATTRIBUTED verdicts: length
    bounds, stopword floor, and repetition ceiling evaluated in a
    fixed rule order; the output carries the first failing rule name
    (the filter-yield debugging face a real ingest needs, not just a
    bit). All metrics are rationals of per-doc integer counts — one
    token-explode aggregation, map-side thereafter; the unrounded
    rationals decide, the rounded copies are display columns (both
    faces share both)."""
    from stockify_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        F.sum(F.when(F.col("tok").isin(*_STOP25), 1).otherwise(0)).alias("n_stop"),
    )
    c = F.col
    stop_r = c("n_stop").cast("double") / c("n_tokens")
    dup_f = 1.0 - c("n_distinct").cast("double") / c("n_tokens")
    reason = (
        F.when(c("n_tokens") < 10, "too_short")
        .when(c("n_tokens") > 400, "too_long")
        .when(stop_r < 0.02, "low_stopwords")
        .when(dup_f > 0.85, "too_repetitive")
        .otherwise("ok")
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(stop_r, 6).alias("stop_ratio"),
        F.round(dup_f, 6).alias("dup_frac"),
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


_BOT_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_ms(ts) // 1000
           - lag(epoch_ms(ts) // 1000) OVER (PARTITION BY user_id ORDER BY ts,
                                             event_id) AS gap_s
  FROM events
),
m AS (
  SELECT user_id, CAST(COUNT(gap_s) AS DOUBLE) AS n,
         CAST(SUM(gap_s) AS DOUBLE) AS s1,
         CAST(SUM(gap_s * gap_s) AS DOUBLE) AS s2
  FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
       ROUND(s1 / n, 4) AS mean_gap_s,
       ROUND(CASE WHEN s1 = 0 THEN 0.0
                  ELSE sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0.0))
                       / (s1 / n) END, 6) AS gap_cv,
       n >= 20 AND s1 > 0
         AND sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0.0)) / (s1 / n) < 0.5
         AS is_bot
FROM m
"""


@register("events_bot_detection", _BOT_SQL)
def events_bot_detection(spark, sf_dir):
    """Traffic-hygiene bot heuristic: per user, the coefficient of
    variation of inter-event gaps — machine traffic is REGULAR (low
    CV at volume), humans are bursty. Gaps are integer SECONDS
    (epoch diff) so Σgap and Σgap² stay exactly representable and
    the moments are order-independent; the tie on simultaneous
    events breaks by event_id on both faces. One lag window + one
    aggregation, all partitioned by user."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp("ts")
    g = ev.select(
        "user_id", (ep - F.lag(ep).over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    m = g.groupBy("user_id").agg(
        F.count("gap_s").cast("double").alias("n"),
        F.sum("gap_s").cast("double").alias("s1"),
        F.sum(F.col("gap_s") * F.col("gap_s")).cast("double").alias("s2"),
    )
    c = F.col
    mean = c("s1") / c("n")
    var = F.greatest(c("s2") / c("n") - mean * mean, F.lit(0.0))
    cv = F.sqrt(var) / mean
    return m.select(
        "user_id",
        c("n").cast("long").alias("n_gaps"),
        F.round(mean, 4).alias("mean_gap_s"),
        F.round(F.when(c("s1") == 0, F.lit(0.0)).otherwise(cv), 6).alias("gap_cv"),
        ((c("n") >= 20) & (c("s1") > 0) & (cv < 0.5)).alias("is_bot"),
    )
