"""Round-8 extension wave 28: SAX motif mining.

Symbolic Aggregate approXimation (Lin, Keogh, Lonardi & Chiu 2003):
slice each series into fixed-length windows, z-normalize the window,
compress it to a few Piecewise-Aggregate-Approximation segment
means, and map each mean to a letter through N(0,1) quantile
breakpoints. Equal-shape windows get equal words regardless of their
level and scale — the z-normalization buys amplitude/offset
invariance — so motif discovery (recurring shapes) reduces to a word
frequency count, and at 100 TB to one shuffle on (series, word).

Alphabet 4 here: breakpoints are the standard-normal quartiles
(-0.6745, 0, +0.6745), window 16 values, 4 PAA segments of 4.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_SAX_WIN = 16
_SAX_SEG = 4
_BP = 0.6745  # Phi^-1(0.75), standard-normal upper quartile

_SAX_SQL = f"""
WITH o AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY event_id) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_type
  FROM events),
f AS (SELECT event_type, value, rn FROM o
      WHERE rn < (n_type // {_SAX_WIN}) * {_SAX_WIN}),
seg AS (
  SELECT event_type, rn // {_SAX_WIN} AS win,
         (rn % {_SAX_WIN}) // {_SAX_SEG} AS seg,
         ROUND(SUM(value), 6) AS ssum
  FROM f GROUP BY 1, 2, 3),
wstat AS (
  SELECT event_type, rn // {_SAX_WIN} AS win,
         ROUND(SUM(value), 6) AS wsum,
         ROUND(SUM(value * value), 6) AS wsum2
  FROM f GROUP BY 1, 2),
lett AS (
  SELECT s.event_type, s.win, s.seg,
         CASE WHEN w.wsum2 / {_SAX_WIN} - (w.wsum / {_SAX_WIN})
                   * (w.wsum / {_SAX_WIN}) <= 0 THEN 'b'
              ELSE CASE
   WHEN (s.ssum / {_SAX_SEG} - w.wsum / {_SAX_WIN})
        / sqrt(w.wsum2 / {_SAX_WIN}
               - (w.wsum / {_SAX_WIN}) * (w.wsum / {_SAX_WIN}))
        < -{_BP} THEN 'a'
   WHEN (s.ssum / {_SAX_SEG} - w.wsum / {_SAX_WIN})
        / sqrt(w.wsum2 / {_SAX_WIN}
               - (w.wsum / {_SAX_WIN}) * (w.wsum / {_SAX_WIN}))
        < 0 THEN 'b'
   WHEN (s.ssum / {_SAX_SEG} - w.wsum / {_SAX_WIN})
        / sqrt(w.wsum2 / {_SAX_WIN}
               - (w.wsum / {_SAX_WIN}) * (w.wsum / {_SAX_WIN}))
        < {_BP} THEN 'c'
   ELSE 'd' END END AS letter
  FROM seg s JOIN wstat w USING (event_type, win)),
words AS (
  SELECT event_type, win,
         string_agg(letter, '' ORDER BY seg) AS word
  FROM lett GROUP BY 1, 2)
SELECT event_type, word, CAST(COUNT(*) AS BIGINT) AS n_windows
FROM words GROUP BY 1, 2
"""


@register("window_sax_motifs", _SAX_SQL)
def window_sax_motifs(spark, sf_dir):
    """SAX motif census per event-type series: non-overlapping
    16-value windows in (event_id) order, z-normalized, PAA to 4
    segment means, quartile-lettered (a<b<c<d), counted by word.
    Identical shapes at different levels/scales collapse onto one
    word (pinned in tests/test_ext39.py with a synthetic series),
    which is what makes the census a motif report and not a value
    histogram.

    Cross-engine float policy: the only order-sensitive reductions
    are the window/segment SUMs — both are rounded to 6dp before any
    derived arithmetic, after which mean/std/normalize/compare are
    identical IEEE expressions on identical doubles; the letter
    comparisons are then deterministic on both engines. Constant
    windows (variance <= 0) pin to 'b' instead of dividing by zero.

    Scale shape: one row-number pass per series, two map-side
    combinable aggregates over the windowed rows ((type,win,seg) and
    (type,win) — a grouping-sets single-pass rewrite exists if the
    double scan ever matters), a 4-rows-per-window letter join, and
    a (type, word) count whose cardinality is bounded by 4^4 words
    per series regardless of data volume."""
    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    wt = Window.partitionBy("event_type")
    o = ev.select(
        "event_type",
        "value",
        (F.row_number().over(wt.orderBy("event_id")) - 1).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n_type"),
    )
    f = o.filter(
        F.col("rn") < (F.col("n_type") / _SAX_WIN).cast("long") * _SAX_WIN
    )
    win = (F.col("rn") / _SAX_WIN).cast("long")
    segi = ((F.col("rn") % _SAX_WIN) / _SAX_SEG).cast("long")
    seg = f.groupBy(
        "event_type", win.alias("win"), segi.alias("seg")
    ).agg(F.round(F.sum("value"), 6).alias("ssum"))
    wstat = f.groupBy("event_type", win.alias("win")).agg(
        F.round(F.sum("value"), 6).alias("wsum"),
        F.round(F.sum(F.col("value") * F.col("value")), 6).alias("wsum2"),
    )
    mu = F.col("wsum") / _SAX_WIN
    var = F.col("wsum2") / _SAX_WIN - mu * mu
    norm = (F.col("ssum") / _SAX_SEG - mu) / F.sqrt(var)
    letter = F.when(var <= 0, F.lit("b")).otherwise(
        F.when(norm < -_BP, F.lit("a"))
        .when(norm < 0, F.lit("b"))
        .when(norm < _BP, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    lett = seg.join(wstat, ["event_type", "win"]).select(
        "event_type", "win", "seg", letter.alias("letter")
    )
    words = lett.groupBy("event_type", "win").agg(
        F.concat_ws(
            "", F.array_sort(F.collect_list(F.struct("seg", "letter"))).letter
        ).alias("word")
    )
    return words.groupBy("event_type", "word").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows")
    )
