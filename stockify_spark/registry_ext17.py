"""Round-8 extension wave 6: integer-exact graph/trend statistics,
closed-form distributed ML, readability scoring, weighted median.

The theme is DETERMINISM BY CONSTRUCTION at scale: every query here
either keeps its distributed aggregation in integers (assortativity,
Mann-Kendall, weighted median — cross-engine float order cannot
matter) or pins the handful of float moments to their exact decimal
values before the closed-form solve (ridge regression — the moment
sums are exact 2dp/4dp decimals, so rounding them is the identity
that kills accumulation-order drift, and the Cramer solve is then
the same IEEE expression chain on both engines)."""

from __future__ import annotations

from stockify_spark.registry import register

_N_ROWS = 1800
_SERIES_LEN = 180

# shared md5-thinned residue graph (same fixture as graph_triangles /
# graph_jaccard, registry_ext13)
_EDGE_CTE17 = (
    "pairs AS (SELECT DISTINCT"
    "   LEAST(l_orderkey % 80, l_partkey % 80) AS a,"
    "   GREATEST(l_orderkey % 80, l_partkey % 80) AS b"
    "  FROM lineitem WHERE l_orderkey % 80 <> l_partkey % 80),"
    " e AS (SELECT a, b FROM pairs WHERE"
    "  CAST(CONCAT('0x', substr(md5(CAST(a AS VARCHAR) || ':' ||"
    "   CAST(b AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 12)"
)

_ASSORT_SQL = f"""
WITH {_EDGE_CTE17},
und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
ed AS (
  SELECT da.d AS j, db.d AS k
  FROM e JOIN deg da ON da.u = e.a JOIN deg db ON db.u = e.b
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS m,
         CAST(SUM(j * k) AS DOUBLE) AS s1,
         CAST(SUM(j + k) AS DOUBLE) AS s2,
         CAST(SUM(j * j + k * k) AS DOUBLE) AS s3
  FROM ed
)
SELECT CAST(m AS BIGINT) AS n_edges,
       ROUND((s1 / m - (s2 / (2.0 * m)) * (s2 / (2.0 * m)))
             / (s3 / (2.0 * m) - (s2 / (2.0 * m)) * (s2 / (2.0 * m))),
             6) AS assortativity
FROM s
"""


@register("graph_assortativity", _ASSORT_SQL)
def graph_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002) of the shared residue
    graph: the Pearson correlation of endpoint degrees over edges,
    r = (S1/m − (S2/2m)²) / (S3/2m − (S2/2m)²) with S1 = Σjk,
    S2 = Σ(j+k), S3 = Σ(j²+k²). Every distributed sum is INTEGER
    (degrees are counts), so cross-engine accumulation order is
    irrelevant and the final ratio is computed from bit-identical
    operands — determinism by construction, no rounding pins needed
    until the 6dp display. One degree aggregation + one broadcast
    join back onto edges + one scalar reduce."""
    from pyspark.sql import functions as F

    from stockify_spark.registry import _t

    li = _t(spark, sf_dir, "lineitem")
    ra = (F.col("l_orderkey") % 80).cast("long")
    rb = (F.col("l_partkey") % 80).cast("long")
    pairs = (
        li.filter(ra != rb)
        .select(F.least(ra, rb).alias("a"), F.greatest(ra, rb).alias("b"))
        .distinct()
    )
    coin = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("a").cast("string"), F.lit(":"), F.col("b").cast("string")
                )
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    # e feeds the degree union and the edge-side joins; materialize
    # to stop each branch re-deriving the thinned edge list
    e = pairs.where(coin % 100 < 12).localCheckpoint(eager=False)
    und = e.select(F.col("a").alias("u")).unionAll(e.select(F.col("b").alias("u")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    ed = (
        e.join(F.broadcast(deg.select(F.col("u").alias("a"), F.col("d").alias("j"))), "a")
        .join(F.broadcast(deg.select(F.col("u").alias("b"), F.col("d").alias("k"))), "b")
    )
    s = ed.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum(F.col("j") * F.col("k")).cast("double").alias("s1"),
        F.sum(F.col("j") + F.col("k")).cast("double").alias("s2"),
        F.sum(F.col("j") * F.col("j") + F.col("k") * F.col("k"))
        .cast("double")
        .alias("s3"),
    )
    half = F.col("s2") / (2.0 * F.col("m"))
    return s.select(
        F.col("m").cast("long").alias("n_edges"),
        F.round(
            (F.col("s1") / F.col("m") - half * half)
            / (F.col("s3") / (2.0 * F.col("m")) - half * half),
            6,
        ).alias("assortativity"),
    )


_MK_SQL = f"""
WITH stocks AS (
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, close
         FROM stocks),
s AS (
  SELECT a.symbol, SUM(SIGN(b.close - a.close)) AS s_stat
  FROM base a JOIN base b ON b.symbol = a.symbol AND b.pos > a.pos
  GROUP BY a.symbol
),
ties AS (
  SELECT symbol, close, COUNT(*) AS t FROM base GROUP BY symbol, close
),
vt AS (
  SELECT symbol,
         SUM(CAST(t * (t - 1) * (2 * t + 5) AS DOUBLE)) AS tie_term,
         CAST(SUM(t) AS DOUBLE) AS n
  FROM ties GROUP BY symbol
),
v AS (
  SELECT symbol, (n * (n - 1.0) * (2.0 * n + 5.0) - tie_term) / 18.0 AS var_s
  FROM vt
)
SELECT CAST(s.symbol AS BIGINT) AS symbol,
       CAST(s.s_stat AS BIGINT) AS s_stat,
       ROUND(v.var_s, 6) AS var_s,
       ROUND(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1.0) / sqrt(v.var_s)
                  WHEN s.s_stat < 0 THEN (s.s_stat + 1.0) / sqrt(v.var_s)
                  ELSE 0.0 END, 6) AS z
FROM s JOIN v ON v.symbol = s.symbol
"""


@register("stats_mann_kendall", _MK_SQL)
def stats_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test per series: S = Σ_{{i<j}}
    sign(x_j − x_i), tie-corrected Var(S) = [n(n−1)(2n+5) −
    Σ_g t(t−1)(2t+5)]/18 over tie groups, continuity-corrected
    Z = (S∓1)/√Var. The nonparametric companion to stats_theil_sen
    (same pair explosion, same symbol partitioning): S and the tie
    counts are INTEGER sums, so the only floats are final closed
    forms on identical operands. The ramp's 18-value period makes
    ties heavy (t = 10 per value per series) — exercising the
    correction term for real."""
    from pyspark.sql import functions as F

    from stockify_spark.sources.fixtures import stocks_ramp

    base = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "close",
    )
    a = base.select("symbol", F.col("pos").alias("pa"), F.col("close").alias("ca"))
    b = base.select("symbol", F.col("pos").alias("pb"), F.col("close").alias("cb"))
    s = (
        a.join(b, "symbol")
        .filter(F.col("pb") > F.col("pa"))
        .groupBy("symbol")
        .agg(F.sum(F.signum(F.col("cb") - F.col("ca")).cast("long")).alias("s_stat"))
    )
    ties = base.groupBy("symbol", "close").agg(F.count(F.lit(1)).alias("t"))
    vt = ties.groupBy("symbol").agg(
        F.sum(
            (F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)).cast("double")
        ).alias("tie_term"),
        F.sum("t").cast("double").alias("n"),
    )
    v = vt.select(
        "symbol",
        (
            (F.col("n") * (F.col("n") - 1.0) * (2.0 * F.col("n") + 5.0) - F.col("tie_term"))
            / 18.0
        ).alias("var_s"),
    )
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1.0) / F.sqrt("var_s"))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1.0) / F.sqrt("var_s"))
        .otherwise(F.lit(0.0))
    )
    return s.join(v, "symbol").select(
        "symbol",
        F.col("s_stat").cast("long").alias("s_stat"),
        F.round("var_s", 6).alias("var_s"),
        F.round(z, 6).alias("z"),
    )


_RIDGE_SQL = """
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         ROUND(SUM(l_quantity), 2) AS sx1,
         ROUND(SUM(l_discount), 2) AS sx2,
         ROUND(SUM(l_quantity * l_quantity), 2) AS sx11,
         ROUND(SUM(l_quantity * l_discount), 2) AS sx12,
         ROUND(SUM(l_discount * l_discount), 4) AS sx22,
         ROUND(SUM(l_extendedprice), 2) AS sy,
         ROUND(SUM(l_quantity * l_extendedprice), 2) AS sx1y,
         ROUND(SUM(l_discount * l_extendedprice), 4) AS sx2y
  FROM lineitem
),
a AS (
  SELECT n + 1.0 AS a11, sx1 AS a12, sx2 AS a13,
         sx11 + 1.0 AS a22, sx12 AS a23, sx22 + 1.0 AS a33,
         sy AS b1, sx1y AS b2, sx2y AS b3, n
  FROM m
),
d AS (
  SELECT *,
         a11 * (a22 * a33 - a23 * a23)
         - a12 * (a12 * a33 - a23 * a13)
         + a13 * (a12 * a23 - a22 * a13) AS det
  FROM a
)
SELECT CAST(n AS BIGINT) AS n_rows,
       ROUND((b1 * (a22 * a33 - a23 * a23)
              - a12 * (b2 * a33 - a23 * b3)
              + a13 * (b2 * a23 - a22 * b3)) / det, 6) AS beta0,
       ROUND((a11 * (b2 * a33 - b3 * a23)
              - b1 * (a12 * a33 - a23 * a13)
              + a13 * (a12 * b3 - b2 * a13)) / det, 6) AS beta1,
       ROUND((a11 * (a22 * b3 - a23 * b2)
              - a12 * (a12 * b3 - b2 * a13)
              + b1 * (a12 * a23 - a22 * a13)) / det, 6) AS beta2
FROM d
"""


@register("ml_ridge_closed_form", _RIDGE_SQL)
def ml_ridge_closed_form(spark, sf_dir):
    """Ridge regression (λ=1 on every diagonal) by the normal
    equations, solved in closed form: y = l_extendedprice on
    [1, l_quantity, l_discount]. The DISTRIBUTED part is one pass of
    nine moment sums (X'X and X'y entries); the solve is Cramer's
    rule on the 3×3 system written as identical column expressions
    on both faces. The moment sums are exact 2dp/4dp decimals
    (quantity is integral, discount/price are 2dp data), so the
    ROUND pins restore the exact decimal value whatever order each
    engine accumulated in — the recursion-input pinning idea
    (orders_holt_forecast) applied to model fitting. Verified
    against numpy.linalg.solve in tests. At 100 TB this is the
    textbook scale shape: shuffle-free map-side partial moments, a
    single tiny reduce, no iteration."""
    from pyspark.sql import functions as F

    from stockify_spark.registry import _t

    li = _t(spark, sf_dir, "lineitem")
    q, dc, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.sum(q), 2).alias("sx1"),
        F.round(F.sum(dc), 2).alias("sx2"),
        F.round(F.sum(q * q), 2).alias("sx11"),
        F.round(F.sum(q * dc), 2).alias("sx12"),
        F.round(F.sum(dc * dc), 4).alias("sx22"),
        F.round(F.sum(y), 2).alias("sy"),
        F.round(F.sum(q * y), 2).alias("sx1y"),
        F.round(F.sum(dc * y), 4).alias("sx2y"),
    )
    a = m.select(
        (F.col("n") + 1.0).alias("a11"),
        F.col("sx1").alias("a12"),
        F.col("sx2").alias("a13"),
        (F.col("sx11") + 1.0).alias("a22"),
        F.col("sx12").alias("a23"),
        (F.col("sx22") + 1.0).alias("a33"),
        F.col("sy").alias("b1"),
        F.col("sx1y").alias("b2"),
        F.col("sx2y").alias("b3"),
        "n",
    )
    c = F.col
    det = (
        c("a11") * (c("a22") * c("a33") - c("a23") * c("a23"))
        - c("a12") * (c("a12") * c("a33") - c("a23") * c("a13"))
        + c("a13") * (c("a12") * c("a23") - c("a22") * c("a13"))
    )
    d = a.withColumn("det", det)
    beta0 = (
        c("b1") * (c("a22") * c("a33") - c("a23") * c("a23"))
        - c("a12") * (c("b2") * c("a33") - c("a23") * c("b3"))
        + c("a13") * (c("b2") * c("a23") - c("a22") * c("b3"))
    ) / c("det")
    beta1 = (
        c("a11") * (c("b2") * c("a33") - c("b3") * c("a23"))
        - c("b1") * (c("a12") * c("a33") - c("a23") * c("a13"))
        + c("a13") * (c("a12") * c("b3") - c("b2") * c("a13"))
    ) / c("det")
    beta2 = (
        c("a11") * (c("a22") * c("b3") - c("a23") * c("b2"))
        - c("a12") * (c("a12") * c("b3") - c("b2") * c("a13"))
        + c("b1") * (c("a12") * c("a23") - c("a22") * c("a13"))
    ) / c("det")
    return d.select(
        c("n").cast("long").alias("n_rows"),
        F.round(beta0, 6).alias("beta0"),
        F.round(beta1, 6).alias("beta1"),
        F.round(beta2, 6).alias("beta2"),
    )


_READ_SQL = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
         AS n_words,
       CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
         AS n_syllables,
       ROUND(206.835
             - 1.015 * (CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
                             AS DOUBLE)
                        / GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1))
             - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                            AS DOUBLE)
                       / len(string_split_regex(trim(lower(text)), '\\s+'))),
             6) AS flesch
FROM documents
"""


@register("text_readability", _READ_SQL)
def text_readability(spark, sf_dir):
    """Flesch reading-ease per document: 206.835 − 1.015·(words/
    sentences) − 84.6·(syllables/words), with the standard
    vowel-group syllable heuristic ([aeiouy]+ runs — consonants and
    whitespace both break a run, so whole-text counting equals
    per-word counting) and sentence count from [.!?]+ runs floored
    at 1. All three counts are integers; the formula is one
    stateless column expression — map-only at any scale."""
    from pyspark.sql import functions as F

    from stockify_spark.functions.text import tokens
    from stockify_spark.registry import _t

    docs = _t(spark, sf_dir, "documents")
    n_words = F.size(tokens("text"))
    n_syll = F.size(F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)), F.lit(1)
    )
    flesch = (
        206.835
        - 1.015 * (n_words.cast("double") / n_sent)
        - 84.6 * (n_syll.cast("double") / n_words)
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_syll.cast("long").alias("n_syllables"),
        F.round(flesch, 6).alias("flesch"),
    )


_WMED_SQL = """
WITH w AS (
  SELECT l_returnflag AS flag, l_extendedprice AS price,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT flag, price, wt,
         SUM(wt) OVER (PARTITION BY flag ORDER BY price) AS cw,
         SUM(wt) OVER (PARTITION BY flag) AS tot
  FROM w
)
SELECT flag, MIN(price) AS weighted_median_price,
       CAST(MAX(tot) AS BIGINT) AS total_weight
FROM cum
WHERE 2 * cw >= tot
GROUP BY flag
"""


@register("agg_weighted_median", _WMED_SQL)
def agg_weighted_median(spark, sf_dir):
    """Weighted median of l_extendedprice per returnflag with
    l_quantity as the weight: the smallest price whose cumulative
    weight reaches half the total. The 2·cw >= tot comparison is
    INTEGER (quantities are integral), so the selection rule is
    exact on both engines — no quantile interpolation anywhere.

    Scale shape (r15): the direct form — groupBy(flag, price) then a
    running sum windowed per flag — funnels the ~|distinct prices|
    table through THREE window tasks (one per returnflag), and at
    sf0.1 prices are near-unique (594k distinct of 600k rows), so
    that stage is data-sized. Chunked prefix scan instead (the
    operators/ranks.py recursion, same as stats_runs_test_chunked):

      1. per-(flag, 256-wide price chunk) weight totals — the
         partial-agg-absorbing shuffle carries ~3·|domain/256| rows
         (~1.3k here), not |distinct prices|;
      2. a prefix sum over THAT tiny table finds, per flag, the one
         chunk where cumulative weight crosses tot/2, plus the exact
         cumulative offset before it;
      3. only that chunk's rows are re-read (broadcast fence join),
         grouped per price, and run through the final per-flag
         window — whose input is bounded by the PRICE DOMAIN inside
         one chunk (≤ 25 600 cent values), not by row count.

    The crossing chunk is exactly the first with 2·ccum >= tot,
    i.e. the row with 2·ccum >= tot AND 2·(ccum − cwt) < tot
    (cumulative weight is monotone since quantities are positive),
    so the fence is one filter — no self-join. Within it,
    off + running_sum equals the global cumulative weight, so the
    selected price is identical to the direct form's."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stockify_spark.registry import _t

    li = _t(spark, sf_dir, "lineitem")
    chunk = F.floor(F.col("l_extendedprice") / 256).cast("long")
    wt = F.sum(F.col("l_quantity").cast("long"))
    cst = li.groupBy(
        F.col("l_returnflag").alias("flag"), chunk.alias("chunk")
    ).agg(wt.alias("cwt"))
    cwin = Window.partitionBy("flag").orderBy("chunk")
    totals = cst.groupBy("flag").agg(F.sum("cwt").alias("tot"))
    cc = cst.select(
        "flag", "chunk", "cwt", F.sum("cwt").over(cwin).alias("ccum")
    ).join(F.broadcast(totals), "flag")
    fence = cc.filter(
        (2 * F.col("ccum") >= F.col("tot"))
        & (2 * (F.col("ccum") - F.col("cwt")) < F.col("tot"))
    ).select(
        F.col("flag").alias("mflag"),
        F.col("chunk").alias("mchunk"),
        (F.col("ccum") - F.col("cwt")).alias("off"),
        "tot",
    )
    sl = li.join(
        F.broadcast(fence),
        (F.col("l_returnflag") == F.col("mflag")) & (chunk == F.col("mchunk")),
    )
    w2 = sl.groupBy(
        F.col("mflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        "off",
        "tot",
    ).agg(wt.alias("wt"))
    pwin = Window.partitionBy("flag").orderBy("price")
    cum = w2.select(
        "flag",
        "price",
        "tot",
        (F.col("off") + F.sum("wt").over(pwin)).alias("cw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tot"))
        .groupBy("flag")
        .agg(
            F.min("price").alias("weighted_median_price"),
            F.max("tot").cast("long").alias("total_weight"),
        )
    )
