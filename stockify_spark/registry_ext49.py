"""Round-8 extension wave 38: interpolated Kneser-Ney smoothing.

text_ngram_lm ships the exact count tables and notes that smoothing
is a pure function of them — this operator is that function, for the
bigram model: interpolated Kneser-Ney (Kneser & Ney 1995; Chen &
Goodman 1998) with absolute discount D = 0.75,

  P(w2|w1) = max(c(w1,w2) - D, 0) / c(w1,.)
           + (D * N1+(w1,.) / c(w1,.)) * (N1+(.,w2) / N1+(.,.))

where N1+ are distinct-continuation counts. The continuation
distribution — "how many contexts has w2 followed?" rather than "how
often?" — is the insight that makes KN the strongest classical LM
smoother: 'francisco' is frequent but follows only 'san', so its
unigram backoff mass collapses. Everything is a ratio of exact
integers; the formula is evaluated with identical parenthesization
on both engines and rounded once at 6dp.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_D = 0.75
_TOPN = 50

_KN_SQL = f"""
WITH tok AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS ts
             FROM documents),
bi AS (SELECT ts[i] AS w1, ts[i+1] AS w2
       FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM tok
             WHERE len(ts) >= 2)),
c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bi GROUP BY 1, 2),
l AS (SELECT w1, SUM(c) AS c1, COUNT(*) AS n1p FROM c2 GROUP BY 1),
r AS (SELECT w2, COUNT(*) AS nc FROM c2 GROUP BY 1),
t AS (SELECT COUNT(*) AS ntot FROM c2),
p AS (SELECT c2.w1, c2.w2, c2.c,
             ROUND((GREATEST(c2.c - {_D}, 0) / l.c1)
                   + (({_D} * l.n1p) / l.c1)
                     * (nc / CAST(t.ntot AS DOUBLE)), 6) AS p_kn,
             ROW_NUMBER() OVER (ORDER BY c2.c DESC, c2.w1, c2.w2) AS rnk
      FROM c2 JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN t)
SELECT w1, w2, c AS n, p_kn FROM p WHERE rnk <= {_TOPN}
"""


@register("text_kneser_ney", _KN_SQL)
def text_kneser_ney(spark, sf_dir):
    """Interpolated-KN bigram probabilities for the corpus's top 50
    bigrams (count-desc, lexicographic tie-break). Properly
    normalized: summing the formula over the FULL vocabulary gives
    exactly 1 for every context (the discounted mass D*N1+(w1,.)
    re-enters through the continuation distribution, which itself
    sums to 1) — pinned algebraically in tests/test_ext49.py over
    full contexts, alongside the continuation-vs-frequency
    separation that distinguishes KN from additive smoothing.

    Scale shape: one bigram-count shuffle with map-side combine
    (corpus-sized input, vocabulary^2-bounded output), then two
    vocabulary-sized aggregates (left-context totals, continuation
    counts) and one scalar; the probability join re-partitions only
    the compact count table — the text_ngram_lm layout with the
    smoothing arithmetic fused on top."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), " "
        ).alias("ts")
    ).filter(F.size("ts") >= 2)
    bi = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.size("ts") - 1),
                F.slice(F.col("ts"), 2, F.size("ts") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("g")
    ).select("g.w1", "g.w2")
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    l = c2.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1p")
    )
    r = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("nc"))
    t = c2.agg(F.count(F.lit(1)).alias("ntot"))
    p_kn = F.round(
        (F.greatest(F.col("c") - _D, F.lit(0.0)) / F.col("c1"))
        + ((_D * F.col("n1p")) / F.col("c1"))
        * (F.col("nc") / F.col("ntot").cast("double")),
        6,
    )
    p = (
        c2.join(l, "w1")
        .join(r, "w2")
        .crossJoin(F.broadcast(t))
        .select(
            "w1",
            "w2",
            "c",
            p_kn.alias("p_kn"),
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), "w1", "w2"))
            .alias("rnk"),
        )
    )
    return p.filter(F.col("rnk") <= _TOPN).select(
        "w1", "w2", F.col("c").alias("n"), "p_kn"
    )
