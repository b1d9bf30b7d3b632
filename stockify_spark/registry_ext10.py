"""Round-7 wave 3: statistical hypothesis tests (chi-square
independence, Welch's t), marketing attribution, typo-tolerant name
joining (pigeonhole-banded edit distance), a Count-Min sketch with
cross-engine-reproducible hashing, CUSUM changepoint scoring,
seasonal decomposition (STL-lite), an inverted text index, a
haversine range join via latitude banding, Pareto/ABC revenue
classification, and higher-order array lambdas.

Each query has an exact DuckDB oracle (driver contract,
__spark_entry__.py). Reference attribution: the reference engine
(stockify.cu) stops at filters/aggregates/windows (stockify.cu:
89-193, 513-634); this module extends the warehouse + training-data
pipeline surface mandated by SURVEY §2.6/§7.6 with the analytics a
stock/event platform runs downstream of those primitives.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t


# ---------------------------------------------------------------------------
# stats_chi2 — chi-square test of independence (priority × status)
# ---------------------------------------------------------------------------

_CHI2_SQL = """
WITH obs AS (SELECT o_orderpriority AS pri, o_orderstatus AS st,
                    CAST(COUNT(*) AS DOUBLE) AS n
             FROM orders GROUP BY 1, 2),
rm AS (SELECT pri, SUM(n) AS rn FROM obs GROUP BY 1),
cm AS (SELECT st, SUM(n) AS cn FROM obs GROUP BY 1),
tot AS (SELECT SUM(n) AS t FROM obs)
SELECT ROUND(SUM((n - rn * cn / t) * (n - rn * cn / t) / (rn * cn / t)), 6) AS chi2,
       CAST((COUNT(DISTINCT pri) - 1) * (COUNT(DISTINCT st) - 1) AS INT) AS dof
FROM obs JOIN rm USING (pri) JOIN cm USING (st) CROSS JOIN tot
"""


@register("stats_chi2", _CHI2_SQL)
def stats_chi2(spark, sf_dir):
    """Pearson chi-square independence test over the priority×status
    contingency table. One groupBy over the fact table builds the
    observed counts; marginals and the grand total are rollups of
    that tiny (|pri|·|st| rows) table, broadcast back — the fact
    table is scanned ONCE and everything after the first shuffle is
    kilobytes regardless of scale. The statistic sums ~15 doubles, so
    cross-engine accumulation drift is ~1e-12 against a 5e-7
    rounding boundary."""
    obs = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderstatus").alias("st"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    rm = obs.groupBy("pri").agg(F.sum("n").alias("rn"))
    cm = obs.groupBy("st").agg(F.sum("n").alias("cn"))
    tot = obs.agg(F.sum("n").alias("t"))
    e = F.col("rn") * F.col("cn") / F.col("t")
    return (
        obs.join(F.broadcast(rm), "pri")
        .join(F.broadcast(cm), "st")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum((F.col("n") - e) * (F.col("n") - e) / e), 6).alias("chi2"),
            (
                (F.countDistinct("pri") - 1) * (F.countDistinct("st") - 1)
            ).cast("int").alias("dof"),
        )
    )


# ---------------------------------------------------------------------------
# stats_ttest — Welch's unequal-variance t-test (click vs view value)
# ---------------------------------------------------------------------------

_TTEST_SQL = """
WITH s AS (SELECT
  AVG(CASE WHEN event_type = 'click' THEN value END) AS m1,
  AVG(CASE WHEN event_type = 'view' THEN value END) AS m2,
  VAR_SAMP(CASE WHEN event_type = 'click' THEN value END) AS v1,
  VAR_SAMP(CASE WHEN event_type = 'view' THEN value END) AS v2,
  CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE) AS n1,
  CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE) AS n2
 FROM events)
SELECT ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
       ROUND((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                + (v2 / n2) * (v2 / n2) / (n2 - 1)), 2) AS df_welch
FROM s
"""


@register("stats_ttest", _TTEST_SQL)
def stats_ttest(spark, sf_dir):
    """Welch two-sample t on event values, click vs view, as ONE
    conditional-aggregation pass — no per-group subqueries, no second
    scan: means/variances/counts for both samples come out of a
    single partial→final aggregate, the same shape at 100 TB. The
    Welch–Satterthwaite df is rounded to 2 (it sums thousands of
    squared terms through VAR_SAMP, whose cross-engine accumulation
    drift is ~1e-9 relative — 6 decimals of a ~4e3 value would sit
    inside the noise)."""
    ev = _t(spark, sf_dir, "events")
    click = F.when(F.col("event_type") == "click", F.col("value"))
    view = F.when(F.col("event_type") == "view", F.col("value"))
    s = ev.agg(
        F.avg(click).alias("m1"),
        F.avg(view).alias("m2"),
        F.var_samp(click).alias("v1"),
        F.var_samp(view).alias("v2"),
        F.count(click).cast("double").alias("n1"),
        F.count(view).cast("double").alias("n2"),
    )
    se1 = F.col("v1") / F.col("n1")
    se2 = F.col("v2") / F.col("n2")
    return s.select(
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2), 6).alias("t_stat"),
        F.round(
            (se1 + se2) * (se1 + se2)
            / (se1 * se1 / (F.col("n1") - 1) + se2 * se2 / (F.col("n2") - 1)),
            2,
        ).alias("df_welch"),
    )


# ---------------------------------------------------------------------------
# events_attribution — last-touch channel attribution for purchases
# ---------------------------------------------------------------------------

_ATTR_SQL = """
WITH seq AS (
  SELECT event_id, user_id, event_type, value,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events)
SELECT COALESCE(channel, '(none)') AS channel,
       CAST(COUNT(*) AS BIGINT) AS purchases,
       ROUND(SUM(value), 6) AS revenue
FROM seq WHERE event_type = 'purchase'
GROUP BY 1
"""


@register("events_attribution", _ATTR_SQL)
def events_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase is credited to the most
    recent PRECEDING non-purchase event of the same user (the
    marketing question behind every funnel dashboard). One ordered
    window per user carries the last non-null channel forward —
    last(ignorenulls) over [-inf, -1) — then a small groupBy rolls
    credited purchases and revenue per channel. A user's history is
    one partition of the window shuffle; no self-join, no explode —
    the naive formulation (join each purchase against all its
    predecessors) is quadratic per user, this is O(n log n) in the
    partition sort."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.unix_millis("ts").alias("ms")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("channel", channel)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("(none)")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            F.round(F.sum("value"), 6).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# join_typo_names — edit-distance-1 name pairs via pigeonhole banding
# ---------------------------------------------------------------------------

_TYPO_SQL = """
SELECT a.s_name AS name_a, b.s_name AS name_b
FROM supplier a JOIN supplier b ON a.s_name < b.s_name
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


@register("join_typo_names", _TYPO_SQL)
def join_typo_names(spark, sf_dir):
    """All supplier-name pairs within Levenshtein distance 1, WITHOUT
    the all-pairs cross join the oracle runs — FastSS deletion-
    neighborhood banding: each name emits itself plus every
    one-character-deleted variant as band keys. Any two strings
    within edit distance 1 share a key (substitution at position p →
    both deletion variants at p coincide; insert/delete → the
    shorter string IS a deletion variant of the longer; equality →
    the identity key), so an equi-join on the key set has perfect
    recall, then one exact levenshtein() verifies. The first cut of
    this operator banded on string HALVES — degenerate on exactly
    this kind of corpus, where every name shares the long constant
    prefix ('Supplier#…'): the prefix half put ALL names in one
    bucket and the 'band' join silently became the all-pairs join it
    was supposed to avoid. Deletion keys don't have that failure
    mode: a bucket collects only names identical everywhere but one
    position, so bucket width is bounded by the alphabet at that
    position (~10 here), independent of shared prefixes. Cost is a
    (L+1)× key explode — the classic FastSS space-for-candidates
    trade, linear in corpus size. A pair sharing several keys
    (names agreeing after multiple deletions) would duplicate, so
    candidates dedup in the same groupBy that feeds the verify."""
    sup = _t(spark, sf_dir, "supplier").select("s_name")
    # keys: the name itself (slot -1) + each single-deletion variant
    keys = F.array_union(
        F.array(F.col("s_name")),
        F.transform(
            F.sequence(F.lit(1), F.length("s_name")),
            lambda p: F.concat(
                F.col("s_name").substr(F.lit(1), p - 1),
                F.col("s_name").substr(
                    p + 1, F.length("s_name")
                ),
            ),
        ),
    )
    bands = sup.select("s_name", F.explode(keys).alias("k"))
    a = bands.select(F.col("s_name").alias("name_a"), "k")
    b = bands.select(F.col("s_name").alias("name_b"), "k")
    cand = (
        a.join(b, "k")
        .filter(F.col("name_a") < F.col("name_b"))
        .groupBy("name_a", "name_b")
        .agg(F.count(F.lit(1)).alias("_nkeys"))
    )
    return cand.filter(
        F.levenshtein("name_a", "name_b") <= 1
    ).select("name_a", "name_b")


# ---------------------------------------------------------------------------
# agg_cms_sketch — Count-Min sketch cells (depth 4 × width 64)
# ---------------------------------------------------------------------------

_CMS_SQL = """
WITH ks AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY 1),
seeds AS (SELECT UNNEST([0, 1, 2, 3]) AS seed)
SELECT CAST(seed AS INT) AS row_idx,
       CAST(CAST(CONCAT('0x', substr(md5(CONCAT(CAST(seed AS VARCHAR), '|',
            CAST(o_custkey AS VARCHAR))), 1, 8)) AS BIGINT) % 64 AS INT) AS bucket,
       CAST(SUM(n) AS BIGINT) AS cell_n
FROM ks CROSS JOIN seeds
GROUP BY 1, 2
"""


@register("agg_cms_sketch", _CMS_SQL)
def agg_cms_sketch(spark, sf_dir):
    """Count-Min sketch of the per-customer order stream: depth 4 ×
    width 64, hash row r of key k = md5(r|k) — the seeded-md5 uniform
    already used by the weighted sampler (registry_ext7), so Spark
    and DuckDB compute bit-identical buckets. Build order matters at
    scale: keys are counted FIRST (one data-sized shuffle with
    map-side partial aggregation), then the 4 hash rows explode off
    the compact key-count table and collapse onto ≤256 cells — the
    explode multiplies distinct keys, never raw rows. Sketch cells
    are plain (row, bucket, count) tuples, so two sketches union+sum
    into one (mergeability is the point of CMS: per-partition /
    per-day sketches combine associatively; point estimate for key k
    = MIN over rows of its 4 cells, biased high, never low)."""
    ks = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    seeded = ks.select(
        "o_custkey",
        "n",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("seed"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("seed").cast("string"),
                        F.lit("|"),
                        F.col("o_custkey").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 64
    )
    return (
        seeded.select(
            F.col("seed").cast("int").alias("row_idx"),
            bucket.cast("int").alias("bucket"),
            "n",
        )
        .groupBy("row_idx", "bucket")
        .agg(F.sum("n").alias("cell_n"))
    )


# ---------------------------------------------------------------------------
# window_cusum — CUSUM changepoint score per event series
# ---------------------------------------------------------------------------

_CUSUM_SQL = """
WITH b AS (
  SELECT event_id, user_id, value, epoch_ms(ts) AS ms,
         AVG(value) OVER (PARTITION BY user_id) AS mu
  FROM events),
c AS (
  SELECT event_id, user_id,
         SUM(value - mu) OVER (PARTITION BY user_id ORDER BY ms, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
  FROM b),
m AS (SELECT user_id, MAX(ABS(cusum)) AS cp FROM c GROUP BY 1)
SELECT c.user_id, ROUND(m.cp, 6) AS cp_score,
       CAST(MIN(c.event_id) AS BIGINT) AS cp_event
FROM c JOIN m ON c.user_id = m.user_id AND ABS(c.cusum) = m.cp
GROUP BY c.user_id, m.cp
"""


@register("window_cusum", _CUSUM_SQL)
def window_cusum(spark, sf_dir):
    """CUSUM changepoint detection per user series: running sum of
    deviations from the series mean; the score is max|CUSUM| and the
    changepoint is the earliest row attaining it. Page's classic
    statistic, all in windows: full-frame AVG for the mean, ordered
    prefix SUM for the path — one shuffle on user_id, both windows
    share the same partitioning so Catalyst plans a single exchange.
    The argmax is recovered relationally (join rows back against the
    per-series max with MIN(event_id) as the deterministic
    tie-break) rather than with max_by, whose tie choice is
    plan-dependent. The ordered prefix sum is accumulation-order-
    FIXED, so both engines produce bit-identical paths given the
    same mean; the mean itself is an unordered reduce with ~1e-12
    cross-engine drift — far below both the 5e-7 rounding boundary
    and any plausible gap between distinct path maxima."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_millis("ts").alias("ms")
    )
    wp = Window.partitionBy("user_id")
    wo = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = ev.withColumn("mu", F.avg("value").over(wp)).withColumn(
        "cusum", F.sum(F.col("value") - F.col("mu")).over(wo)
    )
    m = c.groupBy("user_id").agg(F.max(F.abs(F.col("cusum"))).alias("cp"))
    return (
        c.join(m, "user_id")
        .filter(F.abs(F.col("cusum")) == F.col("cp"))
        .groupBy("user_id", "cp")
        .agg(F.min("event_id").alias("cp_event"))
        .select(
            "user_id",
            F.round("cp", 6).alias("cp_score"),
            F.col("cp_event").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# window_seasonal — STL-lite decomposition of daily revenue
# ---------------------------------------------------------------------------

_SEASONAL_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, ROUND(SUM(o_totalprice), 6) AS rev
  FROM orders GROUP BY 1),
tr AS (
  SELECT d, rev,
         CASE WHEN COUNT(*) OVER w = 7 THEN AVG(rev) OVER w END AS trend
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
se AS (
  SELECT CAST(EXTRACT(dow FROM d) + 1 AS INT) AS dow,
         AVG(rev - trend) AS seasonal
  FROM tr WHERE trend IS NOT NULL GROUP BY 1)
SELECT tr.d, tr.rev,
       ROUND(tr.trend, 6) AS trend,
       ROUND(se.seasonal, 6) AS seasonal,
       ROUND(tr.rev - tr.trend - se.seasonal, 6) AS resid
FROM tr JOIN se ON CAST(EXTRACT(dow FROM tr.d) + 1 AS INT) = se.dow
WHERE tr.trend IS NOT NULL
"""


@register("window_seasonal", _SEASONAL_SQL)
def window_seasonal(spark, sf_dir):
    """Classical seasonal decomposition of daily revenue (the
    additive STL-lite every forecasting pipeline starts from):
    trend = centered 7-row moving average (NULL at the edges where
    the frame is short — a one-sided average would bias the trend),
    seasonal = mean detrended value per day-of-week, residual = the
    rest. The daily rollup is the only data-sized shuffle; trend is
    one ordered window over ~years-of-days rows, and the seasonal
    index is a 7-row broadcast joined back. Day-of-week is pinned to
    Spark's 1=Sunday convention (DuckDB's EXTRACT(dow) is 0=Sunday —
    reconciled in the oracle, not the engine). Daily totals are
    rounded BEFORE the decomposition so both engines detrend the
    same series rather than two ulp-divergent ones."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 6).alias("rev"))
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.withColumn(
        "trend",
        F.when(F.count(F.lit(1)).over(w) == 7, F.avg("rev").over(w)),
    ).filter(F.col("trend").isNotNull())
    se = (
        tr.groupBy(F.dayofweek("d").alias("dow"))
        .agg(F.avg(F.col("rev") - F.col("trend")).alias("seasonal"))
    )
    return (
        tr.join(F.broadcast(se), F.dayofweek(tr["d"]) == se["dow"])
        .select(
            "d",
            "rev",
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round(F.col("rev") - F.col("trend") - F.col("seasonal"), 6).alias(
                "resid"
            ),
        )
    )


# ---------------------------------------------------------------------------
# text_inverted_index — token → document posting lists
# ---------------------------------------------------------------------------

_INVIDX_SQL = r"""
WITH toks AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id,
               UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents)
  WHERE tok <> '')
SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string(list_slice(list_sort(list(doc_id)), 1, 50), ',') AS postings
FROM toks GROUP BY 1
"""


@register("text_inverted_index", _INVIDX_SQL)
def text_inverted_index(spark, sf_dir):
    """Inverted index construction: token → document frequency +
    the first 50 postings (sorted doc_ids, scalarized to CSV because
    the driver's pandas hash cannot digest list cells). The shape IS
    the search-engine build job: explode to (doc, token), ONE
    groupBy per token with collect_set doing the per-document dedup
    inside the aggregation state (a separate distinct() would be a
    second data-sized shuffle for nothing — the set dedups on the
    map side too, so duplicate (doc, tok) pairs collapse before the
    wire). df counts the full set; the rendered postings are capped
    at 50 because an uncapped posting string for a stopword-grade
    token on a 100 TB corpus is itself the OOM (the full set must
    exist to count df exactly — the all-exact contract here; a
    production index would spill postings columnar rather than
    render them). Tokenization matches functions/text.py: lower →
    trim → split on whitespace runs."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    posting_set = F.sort_array(F.collect_set("doc_id"))
    return toks.groupBy("tok").agg(
        F.size(posting_set).cast("long").alias("df"),
        F.array_join(
            F.transform(F.slice(posting_set, 1, 50), lambda x: x.cast("string")),
            ",",
        ).alias("postings"),
    )


# ---------------------------------------------------------------------------
# geo_range_join — haversine radius join via latitude banding
# ---------------------------------------------------------------------------

# Deterministic synthetic coordinates derived from the keys (the
# star-schema tables carry no geography; both engines compute the
# same doubles from the same integers).
_LAT = "(({k} * 7919) % 18000) / 100.0 - 90.0"
_LON = "(({k} * 104729) % 36000) / 100.0 - 180.0"
_GEO_R_KM = 300.0
_GEO_BAND_DEG = 3.0  # 3° of latitude ≈ 333 km > R: ±1 band suffices

_GEO_SQL = f"""
WITH c AS (SELECT c_custkey, {_LAT.format(k='c_custkey')} AS lat,
                  {_LON.format(k='c_custkey')} AS lon
           FROM customer),
s AS (SELECT s_suppkey, {_LAT.format(k='s_suppkey')} AS lat,
             {_LON.format(k='s_suppkey')} AS lon
      FROM supplier)
SELECT c_custkey, s_suppkey,
       ROUND(2 * 6371.0 * asin(sqrt(
         sin(radians(s.lat - c.lat) / 2) * sin(radians(s.lat - c.lat) / 2)
         + cos(radians(c.lat)) * cos(radians(s.lat))
           * sin(radians(s.lon - c.lon) / 2) * sin(radians(s.lon - c.lon) / 2)
       )), 4) AS dist_km
FROM c CROSS JOIN s
WHERE 2 * 6371.0 * asin(sqrt(
         sin(radians(s.lat - c.lat) / 2) * sin(radians(s.lat - c.lat) / 2)
         + cos(radians(c.lat)) * cos(radians(s.lat))
           * sin(radians(s.lon - c.lon) / 2) * sin(radians(s.lon - c.lon) / 2)
       )) <= {_GEO_R_KM}
"""


def _haversine_km(lat1, lon1, lat2, lon2):
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon) * F.sin(dlon)
    )
    return 2 * 6371.0 * F.asin(F.sqrt(a))


@register("geo_range_join", _GEO_SQL)
def geo_range_join(spark, sf_dir):
    """Spatial range join: customer–supplier pairs within 300 km
    (haversine), WITHOUT the cross join the oracle runs. Points are
    bucketed into 3° latitude bands (333 km — strictly wider than
    the radius, so a match is always in the same or an adjacent
    band); each supplier is replicated into its band ±1 and the join
    is a plain equi-join on band id, then the exact haversine
    predicate verifies. Candidate volume drops from |C|·|S| to
    ~|C|·|S|·(3·band/180) — 60× here, and the same at any scale
    because band membership is data-independent. Latitude-only
    banding sidesteps the longitude-convergence problem (a fixed
    lon×lat grid's cells narrow toward the poles, breaking the
    adjacency argument); a production variant would sub-split bands
    by longitude with a cos(lat)-aware width — same plan shape.
    Coordinates are key-derived synthetics (the schema has no
    geography); integer-exact modular arithmetic, identical doubles
    on both engines."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        (((F.col("c_custkey") * 7919) % 18000) / 100.0 - 90.0).alias("c_lat"),
        (((F.col("c_custkey") * 104729) % 36000) / 100.0 - 180.0).alias("c_lon"),
    )
    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (((F.col("s_suppkey") * 7919) % 18000) / 100.0 - 90.0).alias("s_lat"),
        (((F.col("s_suppkey") * 104729) % 36000) / 100.0 - 180.0).alias("s_lon"),
    )
    band = lambda lat: F.floor(lat / _GEO_BAND_DEG).cast("long")  # noqa: E731
    c_banded = cust.withColumn("band", band(F.col("c_lat")))
    s_banded = sup.withColumn(
        "band",
        F.explode(
            F.array(
                band(F.col("s_lat")) - 1,
                band(F.col("s_lat")),
                band(F.col("s_lat")) + 1,
            )
        ),
    )
    dist = _haversine_km(F.col("c_lat"), F.col("c_lon"), F.col("s_lat"), F.col("s_lon"))
    return (
        c_banded.join(s_banded, "band")
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= _GEO_R_KM)
        .select("c_custkey", "s_suppkey", F.round("dist_km", 4).alias("dist_km"))
    )


# ---------------------------------------------------------------------------
# orders_pareto — ABC revenue classification (Pareto bands)
# ---------------------------------------------------------------------------

_PARETO_SQL = """
WITH cust AS (SELECT o_custkey, ROUND(SUM(o_totalprice), 6) AS rev
              FROM orders GROUP BY 1),
r AS (SELECT o_custkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS crev,
             SUM(rev) OVER () AS tot
      FROM cust)
SELECT CASE WHEN crev / tot <= 0.5 THEN 'A'
            WHEN crev / tot <= 0.8 THEN 'B'
            ELSE 'C' END AS cls,
       CAST(COUNT(*) AS BIGINT) AS customers,
       ROUND(SUM(rev), 2) AS revenue
FROM r GROUP BY 1
"""


@register("orders_pareto", _PARETO_SQL)
def orders_pareto(spark, sf_dir):
    """ABC / Pareto classification: rank customers by revenue,
    cumulative-share bands at 50% / 80%, report count + revenue per
    band. The per-customer rollup is the data-sized shuffle; the
    cumulative share is a global ordered prefix sum over the
    CUSTOMER table — the documented single-partition parity shape
    (PLAN_AUDIT.md): correct here because the prefix input is
    already reduced to one row per customer, and the recursable
    two-phase prefix scan (pipeline_token_pack) is the swap-in when
    even the reduced table outgrows one task. Ties on revenue are
    broken by custkey so the running order — and therefore the band
    assignment — is engine-independent. Per-customer revenue is
    rounded to 6dp BEFORE the prefix sum and share comparison (the
    window_seasonal discipline): the per-customer SUM is an unordered
    double accumulation, so without the round cross-engine ulp drift
    could reorder near-tied customers or flip a boundary row's band —
    the custkey tie-break fixes order ties, not value drift."""
    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 6).alias("rev"))
    )
    wo = (
        Window.orderBy(F.col("rev").desc(), F.col("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy()
    r = cust.withColumn("crev", F.sum("rev").over(wo)).withColumn(
        "tot", F.sum("rev").over(wall)
    )
    share = F.col("crev") / F.col("tot")
    return (
        r.withColumn(
            "cls",
            F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C"),
        )
        .groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# fn_lambda — higher-order array functions over embeddings
# ---------------------------------------------------------------------------

_LAMBDA_SQL = """
SELECT vec_id,
       ROUND(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       ROUND(list_sum(list_transform(embedding,
             x -> LEAST(GREATEST(CAST(x AS DOUBLE), -0.1), 0.1))), 6) AS clipped_sum,
       CAST(list_max(embedding) AS DOUBLE) AS vmax,
       CAST(list_min(embedding) AS DOUBLE) AS vmin
FROM embeddings
"""


@register("fn_lambda", _LAMBDA_SQL)
def fn_lambda(spark, sf_dir):
    """Higher-order (lambda) array functions — the JVM-side way to
    compute over array<float> columns without any Python: transform
    + aggregate for the L2 norm, filter + size for sign counts,
    transform-clamp + aggregate for clipped sums, array_max/min
    untouched. Everything runs inside whole-stage codegen; at 100 TB
    this is the difference between a map-only scan and shipping
    every vector through Arrow into a UDF. Elements are cast
    float→double BEFORE arithmetic on both engines, so the fold is
    the same left-to-right double accumulation bit-for-bit (the
    float32 product path would round differently per engine). The
    fold mirrors DuckDB list_sum's edge semantics so the contract is
    data-independent, not a fixture accident: NULL elements are
    skipped (a bare acc+x fold would poison the sum to NULL) and an
    empty / all-NULL array yields NULL (a 0.0 seed alone would
    yield 0.0)."""
    emb = _t(spark, sf_dir, "embeddings")
    dsq = F.transform(
        F.col("embedding"),
        lambda x: x.cast("double") * x.cast("double"),
    )
    clip = F.transform(
        F.col("embedding"),
        lambda x: F.least(F.greatest(x.cast("double"), F.lit(-0.1)), F.lit(0.1)),
    )

    def fold(arr):
        nn = F.filter(arr, lambda x: x.isNotNull())
        return F.when(
            F.size(nn) > 0,
            F.aggregate(nn, F.lit(0.0), lambda acc, x: acc + x),
        )
    return emb.select(
        "vec_id",
        F.round(F.sqrt(fold(dsq)), 6).alias("l2"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("n_pos"),
        F.round(fold(clip), 6).alias("clipped_sum"),
        F.array_max("embedding").cast("double").alias("vmax"),
        F.array_min("embedding").cast("double").alias("vmin"),
    )


# ---------------------------------------------------------------------------
# window_rolling_median — EXACT rolling median (15-row frame)
# ---------------------------------------------------------------------------

_ROLLMED_SQL = """
SELECT event_id, user_id,
       ROUND(MEDIAN(value) OVER (PARTITION BY user_id
                                 ORDER BY epoch_ms(ts), event_id
                                 ROWS BETWEEN 14 PRECEDING AND CURRENT ROW),
             6) AS med
FROM events
"""


@register("window_rolling_median", _ROLLMED_SQL)
def window_rolling_median(spark, sf_dir):
    """EXACT rolling median over a 15-row frame — the robust
    centerline percentile_approx can't give you. Spark has no
    native windowed median, so the frame is materialized as a
    sorted array (collect_list over the window, array_sort) and the
    middle element(s) read out: odd frames take the center, even
    frames average the two centers (a+b)/2. DuckDB's windowed MEDIAN
    interpolates even frames as lo + 0.5*(hi-lo), which can differ
    from (a+b)/2 by an ulp, so both faces round to 6dp — the display
    precision every sibling operator uses — rather than betting the
    exact-hash contract on two formulas agreeing bitwise. The frame is
    BOUNDED (15 rows), so per-row state is constant and the window
    stays one shuffle + one sort per series at any scale; an
    UNBOUNDED frame with this trick would OOM — that variant is what
    the recursive selection operator (operators/sorts.py,
    agg_exact_median) exists for."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_millis("ts").alias("ms")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(-14, 0)
    )
    a = F.array_sort(F.collect_list("value").over(w))
    n = F.size(a)
    odd = F.element_at(a, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(a, (n / 2).cast("int"))
        + F.element_at(a, (n / 2 + 1).cast("int"))
    ) / 2.0
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.when(n % 2 == 1, odd).otherwise(even), 6).alias("med"),
    )


# ---------------------------------------------------------------------------
# events_top_paths — most common 8-step event sequences
# ---------------------------------------------------------------------------

_PATHS_SQL = """
WITH seq AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ms, event_id) AS path
  FROM (SELECT user_id, event_type, event_id, epoch_ms(ts) AS ms,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_ms(ts), event_id) AS rn
        FROM events)
  WHERE rn <= 8 GROUP BY user_id)
SELECT path, CAST(COUNT(*) AS BIGINT) AS users
FROM seq GROUP BY 1
ORDER BY users DESC, path LIMIT 20
"""


@register("events_top_paths", _PATHS_SQL)
def events_top_paths(spark, sf_dir):
    """Top-20 opening event sequences (first 8 events per user,
    rendered 'view>click>…') — the product-analytics path query.
    Row-number window truncates each user's history FIRST, so the
    per-user state that flows into the sequence build is bounded (8
    structs) no matter how long the raw history is; the sequence is
    assembled orderless-shuffle-safe by sorting (ms, event_id,
    event_type) structs inside the aggregate rather than assuming
    any arrival order. Ranking ties at the cut line break on the
    path string itself, keeping the LIMIT deterministic across
    engines."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_millis("ts").alias("ms")
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ms", "event_id")
    )
    seq = (
        ev.withColumn("rn", rn)
        .filter(F.col("rn") <= 8)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ms", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        seq.groupBy("path")
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy(F.col("users").desc(), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# stats_ks — two-sample Kolmogorov–Smirnov statistic (click vs view)
# ---------------------------------------------------------------------------

_KS_SQL = """
WITH s AS (SELECT value,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g2
           FROM events WHERE event_type IN ('click', 'view')
             AND value IS NOT NULL),
v AS (SELECT value, CAST(SUM(g1) AS DOUBLE) AS n1, CAST(SUM(g2) AS DOUBLE) AS n2
      FROM s GROUP BY value),
c AS (SELECT SUM(n1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c1,
             SUM(n2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c2,
             SUM(n1) OVER () AS t1, SUM(n2) OVER () AS t2
      FROM v)
SELECT ROUND(MAX(ABS(c1 / t1 - c2 / t2)), 6) AS ks_d
FROM c
"""


@register("stats_ks", _KS_SQL)
def stats_ks(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov D: the max ECDF gap between the
    click and view value distributions. Values are grouped to
    DISTINCT points first (so ties contribute to both ECDFs at the
    same step — evaluating mid-tie would overstate D), then one
    ordered prefix sum walks the merged support. The prefix counts
    are INTEGER-exact (sums of 0/1 cast after grouping), so the only
    float ops are one division and one subtraction per distinct
    value — bit-identical across engines, no accumulation drift.
    The global ordered window is the documented single-partition
    parity shape (PLAN_AUDIT.md): correct because the input has
    been reduced to distinct values; the recursable two-phase
    prefix scan (pipeline_token_pack) is the swap-in at scales
    where even the distinct support outgrows one task. NULL values
    are filtered on BOTH faces: Spark's Window.orderBy sorts NULLS
    FIRST while DuckDB's ORDER BY defaults NULLS LAST, so a NULL
    event value would join the ECDF walk at opposite ends and shift
    every prefix — excluding it makes the contract data-independent
    (a NULL observation carries no distributional information
    anyway)."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    )
    v = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("double")
        .alias("n1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("double")
        .alias("n2"),
    )
    wo = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    c = v.select(
        F.sum("n1").over(wo).alias("c1"),
        F.sum("n2").over(wo).alias("c2"),
        F.sum("n1").over(wall).alias("t1"),
        F.sum("n2").over(wall).alias("t2"),
    )
    return c.agg(
        F.round(
            F.max(F.abs(F.col("c1") / F.col("t1") - F.col("c2") / F.col("t2"))), 6
        ).alias("ks_d")
    )


# ---------------------------------------------------------------------------
# media_phash_dedup — perceptual-hash image near-dup pairs
# ---------------------------------------------------------------------------

_PHASH_N_BASE = 24
_PHASH_SQL = (
    "SELECT CAST(r AS BIGINT) AS id_a, CAST(r + 1000 AS BIGINT) AS id_b,"
    " CAST(0 AS INT) AS hamming"
    f" FROM range({_PHASH_N_BASE}) t(r)"
)


@register("media_phash_dedup", _PHASH_SQL)
def media_phash_dedup(spark, sf_dir):
    """Image near-duplicate detection: REAL PNG decode → 32×32 DCT →
    63-bit pHash (DC excluded) → 4-band pigeonhole Hamming join
    (llm/phash.py). Closed-form oracle, media-family pattern
    (media_decode_real precedent): each fixture image i has a +10
    uniform-brightness variant at i+1000, and because the DCT of a
    constant image is pure DC — which the hash drops — the variant's
    hash is IDENTICAL by linearity, so the expected pair set is
    exactly {(i, i+1000, 0)}; unrelated seeded-random images sit
    22-44 bits apart (test_ext10 pins both facts). The oracle states
    the construction, not a rerun of the decoder — correctness-only
    in the bench ratio, like the rest of the media family."""
    from stockify_spark.llm.phash import phash_dup_pairs, synthetic_phash_media

    media = synthetic_phash_media(spark, n_base=_PHASH_N_BASE)
    return phash_dup_pairs(media)


# ---------------------------------------------------------------------------
# stream_outer_join — left-outer stream-stream interval join (batch face)
# ---------------------------------------------------------------------------

_SOJ_SQL = """
SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL '30 minutes'
"""


@register("stream_outer_join", _SOJ_SQL)
def stream_outer_join(spark, sf_dir):
    """Batch face of the LEFT OUTER stream-stream interval join
    (streaming/windows.purchases_with_recent_clicks(how='left_outer')):
    purchases keep their row with a NULL click_id when no click
    preceded them within 30 minutes. The streaming face has the
    same bounded state as the inner join — the outer semantics only
    change WHEN a null row may emit (after the watermark passes the
    purchase's join window, since until then a match could still
    arrive); tests/test_streaming.py pins that emission contract.
    The unmatched-row timing problem is exactly why outer stream
    joins REQUIRE watermarks while inner ones merely benefit."""
    from stockify_spark.streaming.windows import purchases_with_recent_clicks

    return purchases_with_recent_clicks(
        _t(spark, sf_dir, "events"), how="left_outer"
    )


# ---------------------------------------------------------------------------
# stats_psi — population stability index (distribution drift)
# ---------------------------------------------------------------------------

_PSI_SQL = """
WITH b AS (SELECT LEAST(CAST(FLOOR(o_totalprice / 60000) AS INT), 9) AS bucket,
                  CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                       THEN 'ref' ELSE 'cur' END AS period
           FROM orders),
c AS (SELECT bucket,
             CAST(SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS DOUBLE) AS n_ref,
             CAST(SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS DOUBLE) AS n_cur
      FROM b GROUP BY 1),
t AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur,
             CAST(COUNT(*) AS DOUBLE) AS nb FROM c)
SELECT ROUND(SUM(((n_ref + 1) / (t_ref + nb) - (n_cur + 1) / (t_cur + nb))
             * ln(((n_ref + 1) / (t_ref + nb))
                  / ((n_cur + 1) / (t_cur + nb)))), 6) AS psi,
       CAST(MAX(nb) AS INT) AS n_buckets
FROM c CROSS JOIN t
"""


@register("stats_psi", _PSI_SQL)
def stats_psi(spark, sf_dir):
    """Population Stability Index between pre- and post-1998 order
    totals — the drift metric every model-monitoring pipeline
    computes between a reference window and production traffic.
    Fixed-width buckets (data-independent edges, so the bucketing
    needs no quantile pass and two DIFFERENT datasets bucket
    identically — the property that makes PSI mergeable across
    days); add-one smoothing keeps empty buckets finite without a
    data-dependent epsilon. One data-sized groupBy; the PSI itself
    sums ≤10 doubles over the broadcast bucket table."""
    orders = _t(spark, sf_dir, "orders")
    b = orders.select(
        F.least(F.floor(F.col("o_totalprice") / 60000).cast("int"), F.lit(9)).alias(
            "bucket"
        ),
        F.when(
            F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")), "ref"
        )
        .otherwise("cur")
        .alias("period"),
    )
    c = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0))
        .cast("double")
        .alias("n_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0))
        .cast("double")
        .alias("n_cur"),
    )
    t = c.agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count(F.lit(1)).cast("double").alias("nb"),
    )
    p = (F.col("n_ref") + 1) / (F.col("t_ref") + F.col("nb"))
    q = (F.col("n_cur") + 1) / (F.col("t_cur") + F.col("nb"))
    return (
        c.crossJoin(F.broadcast(t))
        .agg(
            F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
            F.max("nb").cast("int").alias("n_buckets"),
        )
    )


# ---------------------------------------------------------------------------
# basket_rules — association rules (confidence + lift) over baskets
# ---------------------------------------------------------------------------

_RULES_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_baskets FROM items),
isup AS (SELECT l_partkey, CAST(COUNT(*) AS DOUBLE) AS s FROM items GROUP BY 1),
pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 CAST(COUNT(*) AS DOUBLE) AS s_ab
          FROM items a JOIN items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 3)
SELECT part_a, part_b, CAST(s_ab AS BIGINT) AS support,
       ROUND(s_ab / sa.s, 6) AS conf_a_to_b,
       ROUND(s_ab / sb.s, 6) AS conf_b_to_a,
       ROUND(s_ab * n_baskets / (sa.s * sb.s), 6) AS lift
FROM pairs JOIN isup sa ON sa.l_partkey = part_a
           JOIN isup sb ON sb.l_partkey = part_b
           CROSS JOIN n
"""


@register("basket_rules", _RULES_SQL)
def basket_rules(spark, sf_dir):
    """Association rules on top of basket_pairs' candidate step:
    pair support (≥3) joined against single-item supports for
    confidence both ways and lift. The pair self-join is keyed on
    the basket id (bounded by basket size squared, the Apriori
    guard documented on basket_pairs); item supports are a
    |parts|-row table broadcast to the pair stream, so the rule
    metrics add NO data-sized shuffle beyond the two support
    counts. Ratios are single IEEE divisions per output row —
    engine-exact before the display rounding."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = items.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_baskets")
    )
    isup = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("double").alias("s")
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("double").alias("s_ab"))
        .filter(F.col("s_ab") >= 3)
    )
    sa = isup.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("sa"))
    sb = isup.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("sb"))
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("s_ab").cast("long").alias("support"),
            F.round(F.col("s_ab") / F.col("sa"), 6).alias("conf_a_to_b"),
            F.round(F.col("s_ab") / F.col("sb"), 6).alias("conf_b_to_a"),
            F.round(
                F.col("s_ab") * F.col("n_baskets") / (F.col("sa") * F.col("sb")), 6
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# fn_map_ops — map-typed column functions
# ---------------------------------------------------------------------------

_MAP_SQL = """
WITH w AS (SELECT p_partkey,
                  list_distinct(string_split(p_name, ' ')) AS words
           FROM part)
SELECT p_partkey,
       CAST(len(words) AS INT) AS n_keys,
       array_to_string(list_sort(words), '|') AS keys_sorted,
       CAST(list_sum(list_transform(words, x -> length(x) * 2)) AS BIGINT)
         AS vals_sum_doubled,
       CAST(CASE WHEN list_contains(words, 'widget') THEN 6 END AS INT)
         AS widget_len
FROM w
"""


@register("fn_map_ops", _MAP_SQL)
def fn_map_ops(spark, sf_dir):
    """Map-typed column surface: map_from_arrays → transform_values
    → map_keys / element_at / size, scalarized for the differential
    hash (map cells, like array cells, don't survive the driver's
    pandas canonicalization — and map ITERATION order is engine-
    private, so only order-insensitive renderings are comparable:
    sorted key string, value sum, point lookup). Keys pass through
    array_distinct first — Spark's mapKeyDedupPolicy defaults to
    EXCEPTION, and a name with a repeated word would otherwise kill
    the task. The oracle mirrors the semantics with plain lists
    (DuckDB's MAP element-access conventions have shifted across
    versions; lists state the same contract without that
    dependency)."""
    part = _t(spark, sf_dir, "part")
    words = F.array_distinct(F.split("p_name", " "))
    m = F.map_from_arrays(words, F.transform(words, lambda w: F.length(w)))
    m2 = F.transform_values(m, lambda k, v: v * 2)
    return part.select(
        "p_partkey",
        F.size(m).cast("int").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), "|").alias("keys_sorted"),
        F.aggregate(
            F.map_values(m2), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("vals_sum_doubled"),
        F.element_at(m, F.lit("widget")).cast("int").alias("widget_len"),
    )


# ---------------------------------------------------------------------------
# graph_kcore — bounded-round k-core peel on the residue graph
# ---------------------------------------------------------------------------

_KCORE_K = 8
_KCORE_ROUNDS = 10


def _kcore_sql(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    # every CTE that a later round references TWICE is AS MATERIALIZED:
    # DuckDB's default is to INLINE single-select CTEs, and a chain
    # where n{r} reads n{r-1} twice inlines to 2^rounds copies of the
    # md5 edge build — measured 289 s at sf0.01 vs ~1 s materialized.
    # MATERIALIZED is a pure execution hint; result semantics are
    # identical.
    base = """
WITH li AS (SELECT CAST(l_orderkey % 400 AS BIGINT) AS ra,
                   CAST(l_partkey % 400 AS BIGINT) AS rb FROM lineitem),
e AS MATERIALIZED (SELECT DISTINCT LEAST(ra, rb) AS a, GREATEST(ra, rb) AS b
      FROM li WHERE ra <> rb
        AND CAST(CONCAT('0x', substr(md5(CONCAT(CAST(LEAST(ra, rb) AS VARCHAR),
            ':', CAST(GREATEST(ra, rb) AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 8),
sym AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
n0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM sym)"""
    for r in range(1, rounds + 1):
        base += f""",
n{r} AS MATERIALIZED (SELECT s.a AS node FROM sym s
         JOIN n{r-1} x ON s.a = x.node JOIN n{r-1} y ON s.b = y.node
         GROUP BY s.a HAVING COUNT(*) >= {k})"""
    return base + f"\nSELECT node FROM n{rounds}"


def _kcore_sym_edges(spark, sf_dir):
    """Symmetrized edge list of the md5-thinned residue graph the
    k-core peel runs on (one row per directed edge; each undirected
    edge appears both ways). Checkpointed: every peel round reads it."""
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 400).cast("long").alias("ra"),
        (F.col("l_partkey") % 400).cast("long").alias("rb"),
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.least("ra", "rb").cast("string"),
                        F.lit(":"),
                        F.greatest("ra", "rb").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    e = (
        li.filter((F.col("ra") != F.col("rb")) & (coin < 8))
        .select(F.least("ra", "rb").alias("a"), F.greatest("ra", "rb").alias("b"))
        .distinct()
    )
    return e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)


def _kcore_peel(sym, k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS):
    """Run ``rounds`` degree-peel iterations; returns surviving nodes."""
    nodes = sym.select(F.col("a").alias("node")).distinct()
    for _ in range(rounds):
        nodes = (
            sym.join(nodes.withColumnRenamed("node", "a"), "a")
            .join(nodes.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") >= k)
            .select(F.col("a").alias("node"))
            # each round references the previous round's nodes TWICE
            # (a-face and b-face), so an unbroken lineage doubles the
            # logical plan per round — 2^rounds leaf scans by round
            # 10. Lazy checkpoint keeps the plan linear; it
            # materializes as a side effect of the next round's job
            # (the pagerank lineage discipline, operators/graph.py).
            .localCheckpoint(eager=False)
        )
    return nodes


@register("graph_kcore", _kcore_sql())
def graph_kcore(spark, sf_dir):
    """k-core membership (k=8) by degree peeling on the md5-thinned
    residue graph (the graph_triangles fixture family): repeatedly
    drop nodes whose degree within the surviving set is < k. Both
    engines run EXACTLY 10 peel rounds — a bounded-round contract
    rather than while-changed, because an unrolled fixpoint isn't
    expressible in the oracle's CTE chain and, more importantly,
    bounded rounds is how you'd checkpoint the peel at scale anyway
    (each round is one shuffle; a 100 TB peel runs rounds until a
    round removes nothing and the count check is a cheap
    side-output). On the test graphs the peel converges well before
    round 10 (pinned in tests/test_ext10.py: round 11 removes
    nothing, and every survivor keeps induced degree >= k), so the
    bounded result IS the k-core. The edge table is
    localCheckpointed once and reused by all rounds — the pagerank
    lineage discipline (operators/graph.py)."""
    return _kcore_peel(_kcore_sym_edges(spark, sf_dir))
