"""Round-8 extension wave 15: dedup-quality evaluation and funnel
latency.

The dedup evaluator applies the operators-evaluate-operators pattern
(ml_confusion_metrics, orders_forecast_eval) to the near-dup
pipeline itself: MinHash-LSH's verified output is scored against the
exact-Jaccard ground truth — the number a 100 TB dedup operator has
to report before anyone trusts its banding parameters. Funnel
latency takes the existing click→purchase semi-join and reports the
latency distribution by explicit rank selection (no quantile
interpolation — the agg_weighted_median rule)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t
from stockify_spark.registry_ext import _SHINGLES_SQL, _minhash_oracle_sql

_EXACT_PAIRS_SQL = (
    f"WITH s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents)"
    " SELECT a.doc_id AS id_a, b.doc_id AS id_b"
    " FROM s a JOIN s b ON a.doc_id < b.doc_id"
    " WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
    " / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5"
)

_DEDUP_EVAL_SQL = f"""
WITH lsh AS ({_minhash_oracle_sql()}),
exact AS ({_EXACT_PAIRS_SQL}),
common AS (
  SELECT COUNT(*) AS n FROM lsh JOIN exact
    ON exact.id_a = lsh.id_a AND exact.id_b = lsh.id_b
)
SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
       (SELECT COUNT(*) FROM lsh) AS n_lsh,
       (SELECT n FROM common) AS n_common,
       ROUND(CAST((SELECT n FROM common) AS DOUBLE)
             / (SELECT COUNT(*) FROM exact), 6) AS recall,
       ROUND(CAST((SELECT n FROM common) AS DOUBLE)
             / (SELECT COUNT(*) FROM lsh), 6) AS precision
"""


@register("pipeline_dedup_eval", _DEDUP_EVAL_SQL)
def pipeline_dedup_eval(spark, sf_dir):
    """Recall/precision of the MinHash-LSH near-dup detector against
    exact-Jaccard ground truth (threshold 0.5, the registered
    dedup_minhash_lsh configuration): the banding-parameter
    acceptance test a production dedup runs before trusting 16
    bands x 2 rows at scale. Precision is 1.0 by construction (LSH
    pairs are exact-verified post-banding); recall measures banding
    misses. Integer pair counts -> deterministic ratios. The oracle
    brute-forces the ground truth all-pairs; the Spark face uses the
    prefix-filtered exact join (recall-1.0 by the AllPairs bound),
    so the EVALUATION itself runs at index cost, not quadratic
    cost."""
    from stockify_spark.llm.dedup import minhash_lsh_pairs_seeded, ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    lsh = minhash_lsh_pairs_seeded(
        docs, "text", "doc_id", num_hashes=32, bands=16, jaccard_threshold=0.5
    ).select("id_a", "id_b")
    exact = ngram_jaccard_pairs(docs, "text", "doc_id", k=3, threshold=0.5).select(
        "id_a", "id_b"
    )
    n_exact = exact.count()
    n_lsh = lsh.count()
    n_common = lsh.join(exact, ["id_a", "id_b"]).count()
    return docs.sparkSession.createDataFrame(
        [
            (
                n_exact,
                n_lsh,
                n_common,
                round(n_common / n_exact, 6) if n_exact else None,
                round(n_common / n_lsh, 6) if n_lsh else None,
            )
        ],
        "n_exact long, n_lsh long, n_common long, recall double, precision double",
    )


_TTC_SQL = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
),
latency AS (
  SELECT p.event_id,
         epoch_ms(p.ts) - MAX(epoch_ms(c.ts)) AS ms
  FROM purchases p JOIN clicks c
    ON c.user_id = p.user_id
   AND c.ts < p.ts
   AND epoch_ms(p.ts) - epoch_ms(c.ts) <= 1800000
  GROUP BY p.event_id, epoch_ms(p.ts)
),
rk AS (
  SELECT ms, row_number() OVER (ORDER BY ms) AS rn,
         COUNT(*) OVER () AS n
  FROM latency
)
SELECT CAST(MAX(n) AS BIGINT) AS n_conversions,
       ROUND(AVG(CAST(ms AS DOUBLE)), 1) AS median_ms
FROM rk WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
"""


@register("events_time_to_convert", _TTC_SQL)
def events_time_to_convert(spark, sf_dir):
    """Click→purchase conversion latency: for every purchase with a
    same-user click within 30 minutes, the milliseconds since the
    NEAREST prior click; the median by explicit rank selection (no
    interpolation — integer milliseconds, rank ties value-identical).
    The time-bounded join is the events_funnel semi-join carried one
    step further into a latency metric; state stays bounded by the
    30-minute window at any scale."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    pms = F.unix_millis("pts")
    cms = F.unix_millis("cts")
    lat = (
        p.join(c, "user_id")
        .filter((F.col("cts") < F.col("pts")) & (pms - cms <= 1800000))
        .groupBy("event_id", pms.alias("pm"))
        .agg(F.max(cms).alias("maxc"))
        .select((F.col("pm") - F.col("maxc")).alias("ms"))
    )
    w = Window.orderBy("ms")
    rk = lat.select(
        "ms",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    mid = rk.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return mid.agg(
        F.max("n").cast("long").alias("n_conversions"),
        F.round(F.avg(F.col("ms").cast("double")), 1).alias("median_ms"),
    )
