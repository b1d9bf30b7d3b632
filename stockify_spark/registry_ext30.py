"""Round-8 extension wave 19: gap analytics, streak statistics, and
corpus novelty.

Gap analysis and streaks finish the trading-analytics shapes (lag
comparisons and gaps-and-islands run lengths, both integer/exact-
decimal deterministic). Novelty ratio reuses the first-occurrence
trick (text_heaps_law) at per-document granularity — the freshness
signal an incremental corpus ingest tracks to decide whether a new
batch adds information or repeats the crawl."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_N_ROWS = 1800
_SERIES_LEN = 180

_GAP_SQL = f"""
WITH stocks AS (
  SELECT i AS row_id,
         CAST(450 + (i % 18) * 10 AS DOUBLE) AS open,
         CAST(510 + (i % 18) * 10 AS DOUBLE) AS high,
         CAST(440 + (i % 18) * 10 AS DOUBLE) AS low,
         CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
),
g AS (
  SELECT row_id, open, high, low,
         lag(close) OVER w AS pc
  FROM stocks WINDOW w AS (ORDER BY row_id)
)
SELECT row_id, ROUND(open - pc, 6) AS gap,
       CASE WHEN open > pc THEN 'up' WHEN open < pc THEN 'down'
            ELSE 'none' END AS gap_dir,
       low <= pc AND pc <= high AS gap_filled
FROM g WHERE pc IS NOT NULL AND open <> pc
"""


@register("stocks_gap_analysis", _GAP_SQL)
def stocks_gap_analysis(spark, sf_dir):
    """Opening-gap analytics: bars whose open differs from the prior
    close, with direction and the classic gap-fill test (did the
    bar's [low, high] span revisit the prior close). Pure lag
    comparisons on exact decimals; the first bar and gapless bars
    are excluded by the shared gates. 1-part parity convention
    (stocks_atr)."""
    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100)
    w = Window.orderBy("row_id")
    g = s.select(
        "row_id", "open", "high", "low", F.lag("close").over(w).alias("pc")
    ).filter(F.col("pc").isNotNull() & (F.col("open") != F.col("pc")))
    return g.select(
        "row_id",
        F.round(F.col("open") - F.col("pc"), 6).alias("gap"),
        F.when(F.col("open") > F.col("pc"), "up")
        .when(F.col("open") < F.col("pc"), "down")
        .otherwise("none")
        .alias("gap_dir"),
        ((F.col("low") <= F.col("pc")) & (F.col("pc") <= F.col("high"))).alias(
            "gap_filled"
        ),
    )


_STREAK_SQL = f"""
WITH stocks AS (
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, close
         FROM stocks),
r AS (
  SELECT symbol, pos,
         CASE WHEN close > lag(close) OVER w THEN 1
              WHEN close < lag(close) OVER w THEN -1 ELSE 0 END AS dir
  FROM base WINDOW w AS (PARTITION BY symbol ORDER BY pos)
),
nz AS (SELECT * FROM r WHERE dir <> 0),
runs AS (
  SELECT symbol, dir,
         pos - row_number() OVER (PARTITION BY symbol, dir ORDER BY pos) AS grp
  FROM nz
),
rl AS (
  SELECT symbol, dir, COUNT(*) AS len
  FROM runs GROUP BY symbol, dir, grp
)
SELECT CAST(symbol AS BIGINT) AS symbol,
       CAST(MAX(CASE WHEN dir = 1 THEN len END) AS BIGINT) AS longest_up,
       CAST(MAX(CASE WHEN dir = -1 THEN len END) AS BIGINT) AS longest_down,
       CAST(COUNT(CASE WHEN dir = 1 THEN 1 END) AS BIGINT) AS n_up_streaks,
       CAST(COUNT(CASE WHEN dir = -1 THEN 1 END) AS BIGINT) AS n_down_streaks
FROM rl GROUP BY symbol
"""


@register("stocks_streaks", _STREAK_SQL)
def stocks_streaks(spark, sf_dir):
    """Longest winning/losing streaks per series plus streak counts:
    signed bar-over-bar direction, gaps-and-islands run grouping on
    CONSECUTIVE positions of the same sign (flat bars break runs by
    the pos-arithmetic construction), then per-series maxima. Pure
    integer run-length analytics — the drawdown-family companion
    statistic."""
    from stockify_spark.sources.fixtures import stocks_ramp

    base = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "close",
    )
    w = Window.partitionBy("symbol").orderBy("pos")
    pc = F.lag("close").over(w)
    r = base.select(
        "symbol",
        "pos",
        F.when(F.col("close") > pc, 1)
        .when(F.col("close") < pc, -1)
        .otherwise(0)
        .alias("dir"),
    ).filter(F.col("dir") != 0)
    runs = r.withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("symbol", "dir").orderBy("pos")),
    )
    rl = runs.groupBy("symbol", "dir", "grp").agg(F.count(F.lit(1)).alias("len"))
    c = F.col
    return rl.groupBy("symbol").agg(
        F.max(F.when(c("dir") == 1, c("len"))).cast("long").alias("longest_up"),
        F.max(F.when(c("dir") == -1, c("len"))).cast("long").alias("longest_down"),
        F.count(F.when(c("dir") == 1, F.lit(1))).cast("long").alias("n_up_streaks"),
        F.count(F.when(c("dir") == -1, F.lit(1)))
        .cast("long")
        .alias("n_down_streaks"),
    )


_TOKS30 = "string_split_regex(trim(lower(text)), '\\s+')"
_SHINGLES30 = (
    f"list_distinct(list_transform(range(greatest(len({_TOKS30}) - 3, 0) + 1),"
    f" i -> array_to_string({_TOKS30}[i + 1:i + 3], ' ')))"
)

_NOVELTY_SQL = f"""
WITH s AS (SELECT doc_id, unnest({_SHINGLES30}) AS sh FROM documents),
firsts AS (SELECT sh, MIN(doc_id) AS first_doc FROM s GROUP BY sh),
per_doc AS (
  SELECT s.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel
  FROM s JOIN firsts f ON f.sh = s.sh
  GROUP BY s.doc_id
)
SELECT doc_id, n_shingles, n_novel,
       ROUND(CAST(n_novel AS DOUBLE) / n_shingles, 6) AS novelty_ratio
FROM per_doc
"""


@register("text_novelty_ratio", _NOVELTY_SQL)
def text_novelty_ratio(spark, sf_dir):
    """Per-document shingle novelty in corpus order: the fraction of
    a doc's distinct 3-shingles whose FIRST corpus occurrence is
    this doc (the text_heaps_law first-occurrence trick at document
    granularity). Ingest freshness: near-1 docs add new content,
    near-0 docs repeat the crawl. One shingle shuffle + one
    broadcast-sized first-occurrence join; integer counts."""
    from stockify_spark.llm.dedup import shingles

    docs = _t(spark, sf_dir, "documents")
    s = docs.select("doc_id", F.explode(shingles("text", 3)).alias("sh"))
    firsts = s.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        s.join(firsts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_novel").cast("long").alias("n_novel"),
        F.round(
            F.col("n_novel").cast("double") / F.col("n_shingles"), 6
        ).alias("novelty_ratio"),
    )
