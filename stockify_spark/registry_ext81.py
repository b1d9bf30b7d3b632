"""Round-8 extension wave 70: Wald-Wolfowitz runs test.

The nonparametric randomness check (Wald & Wolfowitz 1940): code
each observation as above/below the median, count RUNS (maximal
same-sign streaks); too few runs means clustering/trend, too many
means oscillation. Under randomness the run count is asymptotically
normal with

  mu = 2 n1 n2 / n + 1,
  var = 2 n1 n2 (2 n1 n2 - n) / (n^2 (n - 1)),

all INTEGER-derived, so the z statistic is exact arithmetic — the
ideal differential-oracle shape. Complements the sequential family
(SPRT stops streams, Ljung-Box pools correlations, this one reads
the sign pattern).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_RUNS_SQL = """
WITH s AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events),
med AS (
  SELECT event_type, value AS median
  FROM (SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, rn) AS vr,
               n
        FROM s)
  WHERE vr = (n + 1) // 2),
x AS (
  SELECT s.event_type, s.rn,
         CASE WHEN s.value > m.median THEN 1 ELSE 0 END AS above
  FROM s JOIN med m USING (event_type)),
runs AS (
  SELECT event_type,
         CAST(SUM(above) AS BIGINT) AS n1,
         CAST(SUM(1 - above) AS BIGINT) AS n2,
         CAST(1 + SUM(CASE WHEN above <> prev THEN 1 ELSE 0 END)
              AS BIGINT) AS r
  FROM (SELECT event_type, above,
               LAG(above) OVER (PARTITION BY event_type ORDER BY rn) AS prev
        FROM x)
  GROUP BY 1)
SELECT event_type, n1, n2, r,
       ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                    / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                       * (n1 + n2 - 1))), 6) AS z
FROM runs
"""


@register("stats_runs_test", _RUNS_SQL)
def stats_runs_test(spark, sf_dir):
    """Runs test per event-type value series in (ts, event_id)
    order, dichotomized at the explicit-rank median ((n+1)//2-th by
    (value, position) — the agg_exact_median rank discipline, with
    ties going to the 'not above' side). Emits the above/below
    counts, the run count, and the normal z. The closed-form moments
    and both failure directions (a sorted series -> huge negative z,
    an alternating series -> huge positive z, a shuffled one -> |z|
    small) are pinned in tests/test_ext81.py.

    Scale shape: one rank window for the median fence, one lag
    window for run boundaries, one integer aggregate — the
    stats_sprt layout, one pass per series at any scale."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    wt = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        "value",
        F.row_number().over(wt).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    med = (
        s.withColumn(
            "vr",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("value", "rn")
            ),
        )
        .filter(F.col("vr") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("value").alias("median"))
    )
    x = s.join(F.broadcast(med), "event_type").select(
        "event_type",
        "rn",
        F.when(F.col("value") > F.col("median"), 1).otherwise(0).alias("above"),
    )
    lagd = x.withColumn(
        "prev",
        F.lag("above").over(Window.partitionBy("event_type").orderBy("rn")),
    )
    runs = lagd.groupBy("event_type").agg(
        F.sum("above").cast("long").alias("n1"),
        F.sum(1 - F.col("above")).cast("long").alias("n2"),
        (
            1
            + F.sum(
                F.when(F.col("above") != F.col("prev"), 1).otherwise(0)
            )
        )
        .cast("long")
        .alias("r"),
    )
    n = (F.col("n1") + F.col("n2")).cast("double")
    mu = 2.0 * F.col("n1") * F.col("n2") / n + 1
    var = (
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - n)
        / (n * n * (n - 1))
    )
    return runs.select(
        "event_type",
        "n1",
        "n2",
        "r",
        F.round((F.col("r") - mu) / F.sqrt(var), 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# stats_runs_test_chunked — the chunked-prefix-scan rewrite of the
# per-series window statistic (r12 verdict item 7): ordered-series
# statistics normally partition their windows by the SERIES key, so
# a single 100 TB series lands in one task (the documented SURVEY
# §7.4.1 class). This variant proves the class is rewritable when a
# series outgrows a task: range-chunk the order, window only within
# (series, chunk), and merge the bounded boundary terms driver-side.
# Same oracle as stats_runs_test — the two plans are hash-equal.
# ---------------------------------------------------------------------------

_N_CHUNKS = 64


def _bucketed(col, lo, hi, n=_N_CHUNKS):
    """Deterministic range bucket of ``col`` into [0, n): floor over
    the series' own [lo, hi] span; a zero-width span (constant
    column) degenerates to one bucket — the recursion case a second
    chunking level would split."""
    width = (hi - lo) / F.lit(float(n))
    return (
        F.when(width <= 0, F.lit(0))
        .otherwise(F.least(F.floor((col - lo) / width), F.lit(n - 1)))
        .cast("int")
    )


@register("stats_runs_test_chunked", _RUNS_SQL)
def stats_runs_test_chunked(spark, sf_dir, _debug: dict | None = None):
    """Wald-Wolfowitz runs test with NO per-series window anywhere in
    the plan — every row_number/lag partitions by (event_type,
    chunk), where chunks are deterministic range buckets of the
    (ts, event_id) order (and of the value domain for the median
    rank). The three cross-chunk merges are driver-side over BOUNDED
    state (series × 64 chunks):

      1. global position rn = within-chunk row_number + the chunk's
         cumulative row-count offset (the chunked prefix scan);
      2. the median — the (n+1)//2-th element by (value, rn) — found
         by locating the value-chunk whose cumulative count straddles
         the target rank, then rank-indexing INSIDE that one chunk;
      3. the run count — within-chunk sign flips summed per chunk,
         plus one boundary term per consecutive non-empty chunk pair
         (last flag of one vs first flag of the next).

    Identical output to stats_runs_test (same SQL oracle; parity and
    the no-series-window plan shape pinned in tests/test_ext91.py).
    Scale shape: shuffles key on (series, chunk) so a hot series
    spreads over 64 tasks; the driver merge is O(series × chunks)
    scalars — at 10¹² rows/series raise _N_CHUNKS or add a second
    chunk level, the same recursion registry_ext14-16 use."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", F.col("value").cast("double").alias("value")
    ).withColumn("_tsd", F.col("ts").cast("double"))

    # --- phase A: global rn via chunked prefix scan -----------------
    spans = ev.groupBy("event_type").agg(
        F.min("_tsd").alias("_tlo"), F.max("_tsd").alias("_thi"),
        F.min("value").alias("_vlo"), F.max("value").alias("_vhi"),
    )
    # materialize the bucketed frame ONCE: phases A/B/C each run a
    # bounded collect at construction time, and without this every
    # collect would re-run the scan + span join + window chain from
    # the source (measured 10-15 s vs ~1 s; the localCheckpoint
    # fault-tolerance trade is documented at
    # llm/dedup.repeated_substring_spans)
    x = ev.join(F.broadcast(spans), "event_type").select(
        "event_type", "ts", "event_id", "value",
        _bucketed(F.col("_tsd"), F.col("_tlo"), F.col("_thi")).alias("_ck"),
        _bucketed(F.col("value"), F.col("_vlo"), F.col("_vhi")).alias("_vc"),
    ).localCheckpoint()
    w_ck = Window.partitionBy("event_type", "_ck").orderBy("ts", "event_id")
    x = x.withColumn("_lrn", F.row_number().over(w_ck))
    if _debug is not None:
        _debug["rn_frame"] = x
    # bounded collect: series × chunks row counts -> prefix offsets
    ck_counts = (
        x.groupBy("event_type", "_ck").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets: dict[tuple, int] = {}
    per_series: dict[str, list] = {}
    for r in ck_counts:
        per_series.setdefault(r["event_type"], []).append((r["_ck"], r["c"]))
    n_by_series: dict[str, int] = {}
    for s, lst in per_series.items():
        acc = 0
        for ck, c in sorted(lst):
            offsets[(s, ck)] = acc
            acc += c
        n_by_series[s] = acc  # series length, no extra job
    off_df = spark.createDataFrame(
        [(s, ck, o) for (s, ck), o in offsets.items()],
        "event_type string, _ck int, _off long",
    )
    # second materialization: the rn frame feeds the median rank, the
    # median filter join, and the flag/lag pass below
    x = (
        x.join(F.broadcast(off_df), ["event_type", "_ck"])
        .withColumn("rn", F.col("_lrn") + F.col("_off"))
        .localCheckpoint()
    )

    # --- phase B: median rank located inside ONE value chunk --------
    w_vc = Window.partitionBy("event_type", "_vc").orderBy("value", "rn")
    xv = x.withColumn("_lvr", F.row_number().over(w_vc))
    if _debug is not None:
        _debug["vr_frame"] = xv
    vc_counts = (
        xv.groupBy("event_type", "_vc").agg(F.count(F.lit(1)).alias("c")).collect()
    )  # bounded: series × chunks
    targets = []
    per_series = {}
    for r in vc_counts:
        per_series.setdefault(r["event_type"], []).append((r["_vc"], r["c"]))
    for s, lst in per_series.items():
        k = (n_by_series[s] + 1) // 2
        acc = 0
        for vc, c in sorted(lst):
            if acc + c >= k:
                targets.append((s, vc, k - acc))
                break
            acc += c
    tgt_df = spark.createDataFrame(
        targets, "event_type string, _vc int, _tgt long"
    )
    med = (
        xv.join(F.broadcast(tgt_df), ["event_type", "_vc"])
        .filter(F.col("_lvr") == F.col("_tgt"))
        .select("event_type", F.col("value").alias("median"))
    )

    # --- phase C: run count from per-chunk partials + boundaries ----
    flags = x.join(F.broadcast(med), "event_type").select(
        "event_type", "_ck", "rn",
        F.when(F.col("value") > F.col("median"), 1).otherwise(0).alias("above"),
    )
    w_ck_rn = Window.partitionBy("event_type", "_ck").orderBy("rn")
    lagd = flags.withColumn("prev", F.lag("above").over(w_ck_rn))
    if _debug is not None:
        _debug["lag_frame"] = lagd
    parts = (
        lagd.groupBy("event_type", "_ck")
        .agg(
            F.sum("above").alias("n1"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("above") != F.col("prev"), 1).otherwise(0)
            ).alias("flips"),
            F.min_by("above", "rn").alias("first_above"),
            F.max_by("above", "rn").alias("last_above"),
        )
        .collect()
    )  # bounded: series × chunks scalar rows
    per_series = {}
    for r in parts:
        per_series.setdefault(r["event_type"], []).append(r)
    rows = []
    for s, lst in per_series.items():
        lst.sort(key=lambda r: r["_ck"])
        n1 = sum(r["n1"] for r in lst)
        n = sum(r["n"] for r in lst)
        flips = sum(r["flips"] for r in lst)
        for a, b in zip(lst, lst[1:]):  # boundary terms
            flips += int(b["first_above"] != a["last_above"])
        rows.append((s, n1, n - n1, 1 + flips))
    runs = spark.createDataFrame(
        rows, "event_type string, n1 long, n2 long, r long"
    )
    n = (F.col("n1") + F.col("n2")).cast("double")
    mu = 2.0 * F.col("n1") * F.col("n2") / n + 1
    var = (
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - n)
        / (n * n * (n - 1))
    )
    return runs.select(
        "event_type",
        "n1",
        "n2",
        "r",
        F.round((F.col("r") - mu) / F.sqrt(var), 6).alias("z"),
    )
