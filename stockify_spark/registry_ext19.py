"""Round-8 extension wave 8: lakehouse metadata operations and two
remaining execution shapes.

The txlog ACID format gains its two Delta-parity metadata features:
additive SCHEMA EVOLUTION (mergeSchema snapshots were already the
read path — this pins the end-to-end behavior through the log) and
zero-copy SHALLOW CLONE (a metadata-only commit referencing the
source's files, with the vacuum foreign-file guard). The two
execution shapes are the depth-2 sequential recursion (biquad IIR
filter — two lags of state, completing the registry_ext14-16
recursion family) and integer bit-interleaving rollups (quadkey /
Z-order curve as a QUERY over synthetic tile coordinates, the same
curve txlog_zorder uses for file clustering)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stockify_spark.registry import register, _t

_N_ROWS = 1800
_SERIES_LEN = 180


def _evolution_table(spark, sf_dir: str) -> str:
    """Scratch table: v0 creates WITHOUT o_orderstatus (keys %3==0),
    v1/v2 append WITH it (keys %3==1, %3==2) — old files must read
    the new column as NULL through the merged-schema snapshot."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        )
        txlog.create(
            o.filter(F.col("o_orderkey") % 3 == 0).drop("o_orderstatus"), path
        )
        txlog.append(o.filter(F.col("o_orderkey") % 3 == 1), path)
        txlog.append(o.filter(F.col("o_orderkey") % 3 == 2), path)

    return _scratch_table(sf_dir, "evo", build)


_EVO_SQL = """
SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'none' ELSE o_orderstatus END AS status,
       COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY 1
"""


@register("txlog_schema_evolution", _EVO_SQL)
def txlog_schema_evolution(spark, sf_dir):
    """Additive schema evolution through the commit log: the table
    is created WITHOUT o_orderstatus, later appends carry it, and
    the merged-schema snapshot must serve the old files' rows with
    NULL status while the new files keep their values — the oracle
    states exactly that net effect over the source table (keys
    %3==0 were written pre-evolution → bucket 'none'). Parquet's
    per-file footer schema is the source of truth; no rewrite of
    old data ever happens."""
    from stockify_spark.sources import txlog

    path = _evolution_table(spark, sf_dir)
    snap = txlog.snapshot(spark, path)
    return snap.groupBy(
        F.coalesce(F.col("o_orderstatus"), F.lit("none")).alias("status")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def _clone_tables(spark, sf_dir: str) -> tuple[str, str]:
    """Scratch pair: a 2-version source, a shallow clone of it, then
    DIVERGENT history on the clone only (append dup of keys %10==0,
    COW-delete keys %7==0)."""
    from stockify_spark.registry_ext7 import _scratch_table
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        src = os.path.join(path, "src")
        dst = os.path.join(path, "dst")
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(o.filter(F.col("o_orderkey") % 2 == 0), src)
        txlog.append(o.filter(F.col("o_orderkey") % 2 == 1), src)
        txlog.clone(src, dst)
        txlog.append(o.filter(F.col("o_orderkey") % 10 == 0), dst)
        txlog.delete_where(spark, dst, F.col("o_orderkey") % 7 == 0)

    root = _scratch_table(sf_dir, "clone", build)
    return os.path.join(root, "src"), os.path.join(root, "dst")


_CLONE_SQL = """
WITH src AS (
  SELECT 'source' AS face, (o_orderkey % 5)::BIGINT AS bucket,
         COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
  FROM orders GROUP BY 1, 2
),
cl AS (
  SELECT 'clone' AS face, (o_orderkey % 5)::BIGINT AS bucket,
         COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
  FROM (SELECT o_orderkey, o_totalprice FROM orders
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 = 0)
  WHERE o_orderkey % 7 <> 0
  GROUP BY 1, 2
)
SELECT * FROM src UNION ALL SELECT * FROM cl
"""


@register("txlog_clone", _CLONE_SQL)
def txlog_clone(spark, sf_dir):
    """Zero-copy shallow clone: the clone's commit 0 references the
    source's live files by absolute path (metadata only — no data
    copied), after which the histories DIVERGE: the clone gets an
    extra append (keys %10==0 duplicated) and a COW delete (keys
    %7==0) while the source must remain byte-identical to its
    pre-clone state. Both faces are read in one result (face =
    source|clone); the oracle states each face's net effect over the
    source table. The vacuum foreign-file guard (txlog.vacuum) keeps
    either table's physical cleanup away from the other's files."""
    from stockify_spark.sources import txlog

    src, dst = _clone_tables(spark, sf_dir)
    s = txlog.snapshot(spark, src).groupBy(
        (F.col("o_orderkey") % 5).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    ).select(F.lit("source").alias("face"), "bucket", "n", "total")
    d = txlog.snapshot(spark, dst).groupBy(
        (F.col("o_orderkey") % 5).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    ).select(F.lit("clone").alias("face"), "bucket", "n", "total")
    return s.unionAll(d)


_QK_DIGIT = "CAST(2 * ((y // {p}) % 2) + ((x // {p}) % 2) AS VARCHAR)"

_QUADKEY_SQL = (
    "WITH pts AS (SELECT user_id % 256 AS x, (user_id * 7) % 256 AS y,"
    " value FROM events),"
    " qk AS (SELECT CONCAT("
    + ", ".join(_QK_DIGIT.format(p=2 ** (7 - i)) for i in range(8))
    + ") AS quadkey, value FROM pts)"
    " SELECT substr(quadkey, 1, 4) AS tile_z4, COUNT(*) AS n_points,"
    " ROUND(SUM(value), 4) AS value_sum"
    " FROM qk GROUP BY 1"
)


@register("events_quadkey_rollup", _QUADKEY_SQL)
def events_quadkey_rollup(spark, sf_dir):
    """Quadkey (Bing-tile / Z-order curve) spatial rollup: synthetic
    tile coordinates x = user_id mod 256, y = 7·user_id mod 256 are
    bit-interleaved into an 8-digit quadkey (digit_i = 2·bit_i(y) +
    bit_i(x), MSB first — the same Morton curve txlog_zorder
    clusters files by), then aggregated at the zoom-4 prefix. All
    integer arithmetic → deterministic strings; the prefix rollup is
    the standard multi-resolution tile-serving aggregation (coarser
    zoom = shorter prefix), one shuffle on the 4-digit key."""
    ev = _t(spark, sf_dir, "events")
    x = (F.col("user_id") % 256).cast("long")
    y = ((F.col("user_id") * 7) % 256).cast("long")
    digits = [
        (
            2 * ((y / F.lit(2 ** (7 - i))).cast("long") % 2)
            + ((x / F.lit(2 ** (7 - i))).cast("long") % 2)
        ).cast("string")
        for i in range(8)
    ]
    qk = ev.select(F.concat(*digits).alias("quadkey"), "value")
    return qk.groupBy(F.substring("quadkey", 1, 4).alias("tile_z4")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("value"), 4).alias("value_sum"),
    )


_BIQUAD_SQL = f"""
WITH RECURSIVE stocks AS (
  SELECT i AS row_id, CAST(500 + (i % 18) * 10 AS DOUBLE) AS close
  FROM range({_N_ROWS}) t(i)
),
base AS (SELECT row_id // {_SERIES_LEN} AS symbol,
                row_id % {_SERIES_LEN} AS pos, close
         FROM stocks),
r AS (
  SELECT symbol, pos, close,
         close AS y, CAST(0.0 AS DOUBLE) AS y1,
         close AS x1, CAST(0.0 AS DOUBLE) AS x2,
         CAST(0 AS BIGINT) AS started
  FROM base WHERE pos = 0
  UNION ALL
  SELECT b.symbol, b.pos, b.close,
         CASE WHEN r.started = 0 THEN b.close
              ELSE 0.2 * b.close + 0.4 * r.x1 + 0.2 * r.x2
                   - (-0.3) * r.y - 0.1 * r.y1 END,
         r.y, b.close, r.x1, 1
  FROM r JOIN base b ON b.symbol = r.symbol AND b.pos = r.pos + 1
)
SELECT CAST(symbol AS BIGINT) AS symbol, CAST(pos AS BIGINT) AS pos,
       ROUND(y, 6) AS filtered
FROM r
"""


@register("window_biquad_filter", _BIQUAD_SQL)
def window_biquad_filter(spark, sf_dir):
    """Second-order IIR (biquad) low-pass filter per series:
    y_t = 0.2·x_t + 0.4·x_{{t-1}} + 0.2·x_{{t-2}} + 0.3·y_{{t-1}} −
    0.1·y_{{t-2}} (poles at |z| ≈ 0.32 — stable), seeded y_0 = x_0,
    y_1 = x_1. DEPTH-2 sequential state — two lags of both input and
    output — closing out the recursion-family shapes (depth-1 EMA/
    Kalman, coupled Wilder, and now the canonical DSP filter). Same
    applyInPandas-per-series vs recursive-CTE construction; the CTE
    carries (y, y1, x1, x2) plus a started flag for the two-sample
    seed."""
    import pandas as pd

    from stockify_spark.sources.fixtures import stocks_ramp

    s = stocks_ramp(spark, cycles=100).select(
        (F.col("row_id") / _SERIES_LEN).cast("long").alias("symbol"),
        (F.col("row_id") % _SERIES_LEN).cast("long").alias("pos"),
        "close",
    )

    def biquad_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos").reset_index(drop=True)
        x = pdf["close"].to_numpy()
        n = len(x)
        y = [0.0] * n
        y[0] = x[0]
        if n > 1:
            y[1] = x[1]
        for t in range(2, n):
            y[t] = (
                0.2 * x[t] + 0.4 * x[t - 1] + 0.2 * x[t - 2]
                - (-0.3) * y[t - 1] - 0.1 * y[t - 2]
            )
        return pd.DataFrame({"symbol": pdf["symbol"], "pos": pdf["pos"], "y": y})

    res = s.groupBy("symbol").applyInPandas(
        biquad_series, schema="symbol long, pos long, y double"
    )
    return res.select("symbol", "pos", F.round("y", 6).alias("filtered"))
