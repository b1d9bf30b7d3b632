"""Round-13 extension wave 93: corpus-statistics operators for the
tokenizer/embedding side of a training-data pipeline.

Four queries: SPPMI (the shifted positive PMI matrix word2vec
implicitly factorizes — Levy & Goldberg 2014 — built over the same
±2 skip-gram window as text_skipgram_pairs), tokenizer vocabulary
coverage (the OOV audit run before freezing a vocab), Mahalanobis
outlier scoring over per-document features (the multivariate version
of the z-score gates in dq_checks, with a closed-form 3×3 covariance
inverse), and data-constrained epoch allocation (how many epochs to
repeat each source under a token budget, with the
diminishing-returns discount of Muennighoff et al. 2023).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_W = 2          # skip-gram window half-width (matches text_skipgram_pairs)
_NEG_K = 5      # SPPMI shift = ln(k), word2vec's negative-sample count
_MIN_N = 3      # drop pairs rarer than this before scoring
_TOPN = 100

_SPPMI_SQL = f"""
WITH tok AS (SELECT string_split(lower(text), ' ') AS ts FROM documents),
pairs AS (
  SELECT ts[i] AS center, ts[i + d] AS context
  FROM (SELECT ts, unnest(range(1, len(ts) + 1)) AS i FROM tok),
       (SELECT unnest(range(1, {_W + 1})) AS d)
  WHERE i + d <= len(ts)
  UNION ALL
  SELECT ts[i + d] AS center, ts[i] AS context
  FROM (SELECT ts, unnest(range(1, len(ts) + 1)) AS i FROM tok),
       (SELECT unnest(range(1, {_W + 1})) AS d)
  WHERE i + d <= len(ts)),
pc AS (SELECT center, context, CAST(COUNT(*) AS DOUBLE) AS n
       FROM pairs GROUP BY 1, 2),
wm AS (SELECT center AS w, SUM(n) AS nw FROM pc GROUP BY 1),
cm AS (SELECT context AS w, SUM(n) AS nc FROM pc GROUP BY 1),
tot AS (SELECT SUM(n) AS t FROM pc),
scored AS (
  SELECT pc.center, pc.context, CAST(pc.n AS BIGINT) AS n,
         greatest(0, ln(pc.n * tot.t / (wm.nw * cm.nc)) - ln({_NEG_K})) AS raw
  FROM pc JOIN wm ON wm.w = pc.center JOIN cm ON cm.w = pc.context
       CROSS JOIN tot
  WHERE pc.n >= {_MIN_N}),
ranked AS (
  SELECT center, context, n, ROUND(raw, 6) AS sppmi,
         ROW_NUMBER() OVER (ORDER BY ROUND(raw, 6) DESC, center, context)
           AS rnk
  FROM scored)
SELECT center, context, n, sppmi FROM ranked WHERE rnk <= {_TOPN}
"""


@register("text_sppmi", _SPPMI_SQL)
def text_sppmi(spark, sf_dir):
    """Top-100 entries of the SPPMI matrix over the ±2 skip-gram
    window: max(0, PMI(w,c) - ln k) with k=5 — the sparse matrix
    whose SVD is equivalent to word2vec SGNS embeddings (Levy &
    Goldberg 2014). Pairs rarer than 3 are dropped first (the
    standard min-count), and ranking happens on the ROUNDED score so
    the cross-engine tie-break (center, context) is decided on
    identical keys.

    Shape: pair generation is the proven single-scan zip_with form
    from text_skipgram_pairs (one corpus scan, 2W struct arrays
    concatenated before one explode); then one (center, context)
    count shuffle with map-side combine; margins are rollups of that
    vocabulary²-bounded table joined back (center margin broadcast;
    at real scale both margins are vocabulary-sized, far under the
    pair table). ln on exact-count ratios: ~ulp drift vs the 6dp
    round."""
    docs = _t(spark, sf_dir, "documents").select(
        F.split(F.lower("text"), " ").alias("ts")
    )
    arrays = []
    for d in range(1, _W + 1):
        n = F.size("ts")
        left = F.slice("ts", 1, F.greatest(n - d, F.lit(0)))
        right = F.slice("ts", d + 1, F.greatest(n - d, F.lit(0)))
        arrays.append(
            F.zip_with(left, right, lambda a, b: F.struct(a.alias("x"), b.alias("y")))
        )
        arrays.append(
            F.zip_with(left, right, lambda a, b: F.struct(b.alias("x"), a.alias("y")))
        )
    pairs = docs.select(F.explode(F.concat(*arrays)).alias("p")).select(
        F.col("p.x").alias("center"), F.col("p.y").alias("context")
    )
    pc = pairs.groupBy("center", "context").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    wm = pc.groupBy(F.col("center").alias("w")).agg(F.sum("n").alias("nw"))
    cm = pc.groupBy(F.col("context").alias("w")).agg(F.sum("n").alias("nc"))
    tot = pc.agg(F.sum("n").alias("t"))
    raw = F.greatest(
        F.lit(0),
        F.log(F.col("n") * F.col("t") / (F.col("nw") * F.col("nc"))) - F.log(F.lit(float(_NEG_K))),
    )
    scored = (
        pc.filter(F.col("n") >= _MIN_N)
        .join(F.broadcast(wm), pc["center"] == wm["w"])
        .drop("w")
        .join(F.broadcast(cm), pc["context"] == cm["w"])
        .crossJoin(F.broadcast(tot))
        .select(
            "center",
            "context",
            F.col("n").cast("bigint").alias("n"),
            F.round(raw, 6).alias("sppmi"),
        )
    )
    ranked = scored.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("sppmi").desc(), "center", "context")
        ),
    )
    return ranked.filter(F.col("rnk") <= _TOPN).select(
        "center", "context", "n", "sppmi"
    )


# ---------------------------------------------------------------------------
# tokenizer_vocab_coverage — OOV audit against a frozen top-K vocab
# ---------------------------------------------------------------------------

_VOCAB_K = 500

_COV_SQL = f"""
WITH tok AS (
  SELECT lang, w
  FROM (SELECT lang, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
        FROM documents)
  WHERE w <> ''),
cnt AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY 1),
vocab AS (SELECT w FROM (
  SELECT w, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rnk FROM cnt)
  WHERE rnk <= {_VOCAB_K}),
lcnt AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1, 2)
SELECT lang,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(SUM(CASE WHEN v.w IS NOT NULL THEN n ELSE 0 END)
             / CAST(SUM(n) AS DOUBLE), 6) AS occ_coverage,
       ROUND(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_type_share
FROM lcnt LEFT JOIN vocab v USING (w)
GROUP BY lang
"""


@register("tokenizer_vocab_coverage", _COV_SQL)
def tokenizer_vocab_coverage(spark, sf_dir):
    """Vocabulary-coverage audit: freeze the corpus-global top-500
    tokens (count desc, lexicographic tie-break — the deterministic
    vocab a tokenizer build would emit) and report, per language,
    what fraction of token OCCURRENCES the frozen vocab covers and
    what fraction of distinct TYPES fall outside it. The per-language
    split is the point — a vocab frozen on the majority language
    under-covers the tail languages, and this is the query that
    shows it before training does.

    Shape: one exploded-token scan feeds both the global count table
    and the per-language count table (two compact (token, count)
    shuffles with map-side combine); the frozen vocab is a top-K of
    the global table (vocabulary-sized, broadcast into the left
    join); everything after the explode is bounded by vocabulary,
    never the token stream."""
    tok = _t(spark, sf_dir, "documents").select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
            )
        ).alias("w"),
    )
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        cnt.withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.col("n").desc(), "w"))
        )
        .filter(F.col("rnk") <= _VOCAB_K)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    lcnt = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("n"))
    j = lcnt.join(F.broadcast(vocab), "w", "left")
    return j.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.round(
            F.sum(F.when(F.col("in_vocab").isNotNull(), F.col("n")).otherwise(0))
            / F.sum("n").cast("double"),
            6,
        ).alias("occ_coverage"),
        F.round(
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("oov_type_share"),
    )


# ---------------------------------------------------------------------------
# dq_mahalanobis_outliers — multivariate outlier gate on doc features
# ---------------------------------------------------------------------------

# Feature vector per document: x1 = n_chars, x2 = whitespace token
# count, x3 = mean token length. The 3x3 covariance inverse is the
# closed-form adjugate/determinant — identical expression text on
# both engines.
_MAHA_SQL = """
WITH f AS (
  SELECT doc_id,
         CAST(n_chars AS DOUBLE) AS x1,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS x2,
         CAST(n_chars AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS x3
  FROM documents),
m AS (
  SELECT AVG(x1) AS m1, AVG(x2) AS m2, AVG(x3) AS m3,
         COVAR_POP(x1, x1) AS s11, COVAR_POP(x1, x2) AS s12,
         COVAR_POP(x1, x3) AS s13, COVAR_POP(x2, x2) AS s22,
         COVAR_POP(x2, x3) AS s23, COVAR_POP(x3, x3) AS s33
  FROM f),
inv AS (
  SELECT m1, m2, m3,
         (s22 * s33 - s23 * s23) / det AS i11,
         (s13 * s23 - s12 * s33) / det AS i12,
         (s12 * s23 - s13 * s22) / det AS i13,
         (s11 * s33 - s13 * s13) / det AS i22,
         (s13 * s12 - s11 * s23) / det AS i23,
         (s11 * s22 - s12 * s12) / det AS i33
  FROM (SELECT *,
          s11 * (s22 * s33 - s23 * s23)
        - s12 * (s12 * s33 - s23 * s13)
        + s13 * (s12 * s23 - s22 * s13) AS det
        FROM m)),
scored AS (
  SELECT doc_id,
         ROUND((x1 - m1) * (i11 * (x1 - m1) + i12 * (x2 - m2) + i13 * (x3 - m3))
             + (x2 - m2) * (i12 * (x1 - m1) + i22 * (x2 - m2) + i23 * (x3 - m3))
             + (x3 - m3) * (i13 * (x1 - m1) + i23 * (x2 - m2) + i33 * (x3 - m3)),
             6) AS md2
  FROM f CROSS JOIN inv)
SELECT doc_id, md2
FROM (SELECT doc_id, md2,
             ROW_NUMBER() OVER (ORDER BY md2 DESC, doc_id) AS rnk
      FROM scored)
WHERE rnk <= 50
"""


@register("dq_mahalanobis_outliers", _MAHA_SQL)
def dq_mahalanobis_outliers(spark, sf_dir):
    """Top-50 multivariate outliers by squared Mahalanobis distance
    over (n_chars, token count, mean token length) — the correlated
    version of dq_checks' univariate z-gates: a document can be
    inlier on every marginal yet far off the feature correlation
    ridge, and md² is what catches it. The 3×3 covariance inverse is
    the closed-form adjugate, written as the IDENTICAL expression on
    both engines; ranking is on the 6dp-ROUNDED score with doc_id
    tie-break so the top-50 boundary is decided on identical keys.

    Shape: one scan computes the nine moment aggregates (a single
    reduce to one row, broadcast back), a second scan scores rows
    map-side, and the top-50 is a TakeOrdered — no global sort, no
    driver loop; the two scans are the price of mean/covariance
    centering (same trade as stats_brown_forsythe documents)."""
    d = _t(spark, sf_dir, "documents")
    x2 = F.size(F.split(F.col("text"), " ")).cast("double")
    f = d.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("x1"),
        x2.alias("x2"),
        (F.col("n_chars").cast("double") / x2).alias("x3"),
    )
    m = f.agg(
        F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"),
        F.avg("x3").alias("m3"),
        F.covar_pop("x1", "x1").alias("s11"),
        F.covar_pop("x1", "x2").alias("s12"),
        F.covar_pop("x1", "x3").alias("s13"),
        F.covar_pop("x2", "x2").alias("s22"),
        F.covar_pop("x2", "x3").alias("s23"),
        F.covar_pop("x3", "x3").alias("s33"),
    )
    s = {k: F.col(k) for k in ("s11", "s12", "s13", "s22", "s23", "s33")}
    det = (
        s["s11"] * (s["s22"] * s["s33"] - s["s23"] * s["s23"])
        - s["s12"] * (s["s12"] * s["s33"] - s["s23"] * s["s13"])
        + s["s13"] * (s["s12"] * s["s23"] - s["s22"] * s["s13"])
    )
    inv = m.withColumn("det", det).select(
        "m1",
        "m2",
        "m3",
        ((s["s22"] * s["s33"] - s["s23"] * s["s23"]) / F.col("det")).alias("i11"),
        ((s["s13"] * s["s23"] - s["s12"] * s["s33"]) / F.col("det")).alias("i12"),
        ((s["s12"] * s["s23"] - s["s13"] * s["s22"]) / F.col("det")).alias("i13"),
        ((s["s11"] * s["s33"] - s["s13"] * s["s13"]) / F.col("det")).alias("i22"),
        ((s["s13"] * s["s12"] - s["s11"] * s["s23"]) / F.col("det")).alias("i23"),
        ((s["s11"] * s["s22"] - s["s12"] * s["s12"]) / F.col("det")).alias("i33"),
    )
    d1 = F.col("x1") - F.col("m1")
    d2 = F.col("x2") - F.col("m2")
    d3 = F.col("x3") - F.col("m3")
    md2 = F.round(
        d1 * (F.col("i11") * d1 + F.col("i12") * d2 + F.col("i13") * d3)
        + d2 * (F.col("i12") * d1 + F.col("i22") * d2 + F.col("i23") * d3)
        + d3 * (F.col("i13") * d1 + F.col("i23") * d2 + F.col("i33") * d3),
        6,
    )
    scored = f.crossJoin(F.broadcast(inv)).select("doc_id", md2.alias("md2"))
    ranked = scored.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("md2").desc(), "doc_id"))
    )
    return ranked.filter(F.col("rnk") <= 50).select("doc_id", "md2")


# ---------------------------------------------------------------------------
# pipeline_epoch_allocation — data-constrained multi-epoch budgeting
# ---------------------------------------------------------------------------

_EPOCH_CAP = 4.0    # max epochs any source may repeat
_RSTAR = 2.5        # diminishing-returns constant (Muennighoff et al. 2023,
                    # where repeated tokens decay with R* ≈ a few epochs)
_TAU = 0.5          # sampling temperature for the source weights

_EPOCH_SQL = f"""
WITH t AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS tokens
  FROM documents GROUP BY 1),
w AS (SELECT source, tokens, pow(tokens, {_TAU}) AS wt FROM t),
g AS (SELECT SUM(tokens) AS total, SUM(wt) AS wsum FROM w),
a AS (
  SELECT source, tokens,
         wt / wsum AS share,
         least({_EPOCH_CAP}, (2 * total) * (wt / wsum) / tokens) AS epochs
  FROM w CROSS JOIN g)
SELECT source,
       CAST(tokens AS BIGINT) AS n_tokens,
       ROUND(share, 6) AS share,
       ROUND(epochs, 6) AS epochs,
       ROUND(epochs * tokens, 2) AS allocated_tokens,
       ROUND(tokens * {_RSTAR} * (1 - exp(-epochs / {_RSTAR})), 2)
         AS effective_tokens
FROM a
"""


@register("pipeline_epoch_allocation", _EPOCH_SQL)
def pipeline_epoch_allocation(spark, sf_dir):
    """Data-constrained epoch allocation: split a token budget of
    2× the corpus across sources by temperature-flattened weights
    (τ=0.5 — the share pipeline_temperature_mix computes), cap any
    source at 4 epochs, and report EFFECTIVE tokens under the
    diminishing-returns discount of repeated data
    (tokens·R*·(1-e^(-epochs/R*)), the exponential-decay form fit in
    Muennighoff et al. 2023's data-constrained scaling laws). The
    gap between allocated and effective tokens is the quantity that
    tells a budget owner when repeating a small high-weight source
    stops paying.

    Shape: one exploded-free token count per source (len(split) is a
    map-side expression — the corpus is scanned once, no explode),
    one 20-row aggregate, scalar arithmetic after a broadcast of the
    two totals."""
    t = _t(spark, sf_dir, "documents").groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("double").alias("tokens")
    )
    w = t.withColumn("wt", F.pow("tokens", _TAU))
    g = w.agg(F.sum("tokens").alias("total"), F.sum("wt").alias("wsum"))
    a = w.crossJoin(F.broadcast(g)).select(
        "source",
        "tokens",
        (F.col("wt") / F.col("wsum")).alias("share"),
        F.least(
            F.lit(_EPOCH_CAP),
            (2 * F.col("total")) * (F.col("wt") / F.col("wsum")) / F.col("tokens"),
        ).alias("epochs"),
    )
    return a.select(
        "source",
        F.col("tokens").cast("bigint").alias("n_tokens"),
        F.round("share", 6).alias("share"),
        F.round("epochs", 6).alias("epochs"),
        F.round(F.col("epochs") * F.col("tokens"), 2).alias("allocated_tokens"),
        F.round(
            F.col("tokens") * _RSTAR * (1 - F.exp(-F.col("epochs") / _RSTAR)), 2
        ).alias("effective_tokens"),
    )
