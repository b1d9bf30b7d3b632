"""Round-8 extension wave 20: revenue-bridge decomposition and
corpus drift divergence.

The revenue bridge is the FP&A waterfall: month-over-month revenue
change split exactly into a volume effect and a price/mix effect
(the two terms SUM to the delta by construction — an in-result
identity check like agg_bitmap_distinct's). JSD closes the
distribution-distance family (PSI/KS/chi²/MI already registered)
with the symmetric bounded divergence used for corpus drift between
sources; both queries are integer-count/pinned-decimal
deterministic."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_BRIDGE_SQL = """
WITH rev AS (
  SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS ym,
         CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(SUM(o_totalprice), 2) AS r
  FROM orders GROUP BY 1
),
seq AS (
  SELECT ym, n, r,
         lag(n) OVER w AS pn, lag(r) OVER w AS pr
  FROM rev WINDOW w AS (ORDER BY ym)
)
SELECT CAST(ym AS BIGINT) AS ym, n, ROUND(r, 2) AS revenue,
       ROUND(r - pr, 2) AS delta,
       ROUND((n - pn) * (pr / pn), 4) AS volume_effect,
       ROUND(n * (r / n - pr / pn), 4) AS price_mix_effect
FROM seq WHERE pn IS NOT NULL
"""


@register("orders_revenue_bridge", _BRIDGE_SQL)
def orders_revenue_bridge(spark, sf_dir):
    """Month-over-month revenue bridge: Δrevenue decomposed into a
    volume effect (Δn at the OLD average price) and a price/mix
    effect (new volume times the change in average price) — the two
    terms sum to the delta EXACTLY by algebra:
    Δn·p̄₀ + n₁(p̄₁−p̄₀) = n₁p̄₁ − n₀p̄₀. Inputs are the 2dp-pinned
    monthly sums and integer counts, so both engines divide
    identical operands; one lag window over ~80 monthly rows."""
    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("r"),
    )
    w = Window.orderBy("ym")
    seq = rev.select(
        "ym", "n", "r",
        F.lag("n").over(w).alias("pn"),
        F.lag("r").over(w).alias("pr"),
    ).filter(F.col("pn").isNotNull())
    c = F.col
    return seq.select(
        c("ym").cast("long").alias("ym"),
        c("n").cast("long").alias("n"),
        F.round("r", 2).alias("revenue"),
        F.round(c("r") - c("pr"), 2).alias("delta"),
        F.round((c("n") - c("pn")) * (c("pr") / c("pn")), 4).alias("volume_effect"),
        F.round(c("n") * (c("r") / c("n") - c("pr") / c("pn")), 4).alias(
            "price_mix_effect"
        ),
    )


_TOKS31 = "string_split_regex(trim(lower(text)), '\\s+')"

_JSD_SQL = f"""
WITH tok AS (
  SELECT CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
              THEN 'even' ELSE 'odd' END AS grp,
         unnest({_TOKS31}) AS tok
  FROM documents
),
cnt AS (SELECT grp, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT grp, CAST(SUM(c) AS DOUBLE) AS t FROM cnt GROUP BY 1),
vocab AS (SELECT DISTINCT tok FROM cnt),
pq AS (
  SELECT v.tok,
         COALESCE(MAX(CASE WHEN cnt.grp = 'even' THEN cnt.c END), 0)
           / MAX(CASE WHEN tot.grp = 'even' THEN tot.t END) AS p,
         COALESCE(MAX(CASE WHEN cnt.grp = 'odd' THEN cnt.c END), 0)
           / MAX(CASE WHEN tot.grp = 'odd' THEN tot.t END) AS q
  FROM vocab v
  LEFT JOIN cnt ON cnt.tok = v.tok
  CROSS JOIN tot
  GROUP BY v.tok
)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
       ROUND(SUM(CASE WHEN p > 0
                      THEN 0.5 * p * ln(p / (0.5 * (p + q))) ELSE 0 END)
             + SUM(CASE WHEN q > 0
                        THEN 0.5 * q * ln(q / (0.5 * (p + q))) ELSE 0 END),
             6) AS jsd_nats
FROM pq
"""


@register("text_js_divergence", _JSD_SQL)
def text_js_divergence(spark, sf_dir):
    """Jensen-Shannon divergence between the unigram distributions
    of the even- and odd-numbered sources: JSD = ½KL(P‖M) + ½KL(Q‖M)
    with M the midpoint — symmetric, bounded by ln 2, and defined
    even where one side has zero mass (those terms vanish by the
    CASE guards, identical on both faces). Probabilities are integer
    counts over integer totals; corpus drift monitoring between
    ingest sources at any scale is this one contingency shuffle."""
    docs = _t(spark, sf_dir, "documents")
    from stockify_spark.functions.text import tokens

    grp = F.when(
        F.substring("source", 4, 10).cast("long") % 2 == 0, "even"
    ).otherwise("odd")
    tok = docs.select(grp.alias("grp"), F.explode(tokens("text")).alias("tok"))
    cnt = tok.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(
        eager=False
    )
    tot = cnt.groupBy("grp").agg(F.sum("c").cast("double").alias("t"))
    c = F.col
    # per-group totals enter via broadcast cross joins so a token
    # absent from one group still gets a well-defined 0 probability
    tote = tot.filter(c("grp") == "even").select(c("t").alias("te"))
    toto = tot.filter(c("grp") == "odd").select(c("t").alias("to"))
    base = (
        cnt.groupBy("tok")
        .agg(
            F.coalesce(F.max(F.when(c("grp") == "even", c("c"))), F.lit(0)).alias(
                "ce"
            ),
            F.coalesce(F.max(F.when(c("grp") == "odd", c("c"))), F.lit(0)).alias(
                "co"
            ),
        )
        .crossJoin(F.broadcast(tote))
        .crossJoin(F.broadcast(toto))
        .select(
            (c("ce") / c("te")).alias("p"), (c("co") / c("to")).alias("q")
        )
    )
    m = 0.5 * (c("p") + c("q"))
    term_p = F.when(c("p") > 0, 0.5 * c("p") * F.log(c("p") / m)).otherwise(0.0)
    term_q = F.when(c("q") > 0, 0.5 * c("q") * F.log(c("q") / m)).otherwise(0.0)
    return base.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.round(F.sum(term_p) + F.sum(term_q), 6).alias("jsd_nats"),
    )
