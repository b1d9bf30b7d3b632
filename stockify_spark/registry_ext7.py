"""TPC-H completion: Q2 / Q9 / Q11 / Q16 / Q20 over a derived PARTSUPP.

The driver's testdata has no partsupp table, which blocked these five
queries (COVERAGE.md documented the gap). They are unblocked by a
DETERMINISTIC reconstruction (sources/fixtures.derive_partsupp):
distinct observed (l_partkey, l_suppkey) pairs + integer-hash
availqty/supplycost — identical in Spark and in the oracle's CTE, so
the differential check is exact. Query shapes follow the public
TPC-H spec, with columns adapted to the driver schema (no p_mfgr /
s_address / s_comment; Q16's excluded-supplier set uses negative
account balances instead of comment scraping to preserve the NOT IN
shape).
"""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from stockify_spark.registry import register, _t
from stockify_spark.sources.fixtures import (
    PS_COST_MOD,
    PS_COST_MUL_PART,
    PS_COST_MUL_SUPP,
    PS_QTY_MOD,
    PS_QTY_MUL_PART,
    PS_QTY_MUL_SUPP,
    derive_partsupp,
    ps_supplycost_expr,
)

# The oracle CTE interpolates the SAME constants the Spark-side
# expressions use (sources/fixtures.py) — one definition, two engines.
_PS_CTE = f"""WITH partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         ((ps_partkey*{PS_QTY_MUL_PART} + ps_suppkey*{PS_QTY_MUL_SUPP}) % {PS_QTY_MOD} + 1)::BIGINT AS ps_availqty,
         ((ps_partkey*{PS_COST_MUL_PART} + ps_suppkey*{PS_COST_MUL_SUPP}) % {PS_COST_MOD})::DOUBLE / 100.0 + 1.0 AS ps_supplycost
  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem)
)"""


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part in a region
# ---------------------------------------------------------------------------

_Q2_SQL = _PS_CTE + """,
eu AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, s.s_acctbal, s.s_name, n.n_name
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
),
mc AS (SELECT ps_partkey, MIN(ps_supplycost) AS min_cost FROM eu GROUP BY ps_partkey)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand
FROM part p
JOIN eu e ON e.ps_partkey = p.p_partkey
JOIN mc ON mc.ps_partkey = p.p_partkey AND e.ps_supplycost = mc.min_cost
WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE'
"""


@register("tpch_q2", _Q2_SQL)
def tpch_q2(spark, sf_dir):
    """Q2 (public TPC-H spec): cheapest EUROPE supplier for each
    size-10..20 LARGE part. The region-restricted catalog aggregates to a
    per-part min, re-joined on cost equality (exact: supplycost is an
    integer-derived double). Dims broadcast; the only data-sized
    shuffle is the partsupp distinct."""
    ps = derive_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    # per-part minimum as a WINDOW over the single eu pass instead of
    # a groupBy + self-join back: the catalog is referenced once, so
    # no materialization barrier (persist/checkpoint) is needed at
    # all, and the only data-sized exchanges are the partsupp
    # distinct and the ps_partkey window shuffle
    w = W.partitionBy("ps_partkey")
    cheapest = eu.withColumn("min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    return (
        F.broadcast(part)
        .join(cheapest, part.p_partkey == cheapest.ps_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------

_Q9_SQL = _PS_CTE + """
SELECT n.n_name AS nation, YEAR(o.o_orderdate)::BIGINT AS o_year,
       ROUND(SUM(l.l_extendedprice*(1-l.l_discount) - ps.ps_supplycost*l.l_quantity), 2) AS profit
FROM lineitem l
JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
"""


@register("tpch_q9", _Q9_SQL)
def tpch_q9(spark, sf_dir):
    """Q9: profit on red parts by supplier nation and order year —
    the classic many-join star over the fact table.

    The partsupp join is INLINED: the derived catalog's supplycost is
    a pure integer-hash function of (partkey, suppkey), and its key
    domain is exactly lineitem's distinct pairs — so joining the fact
    back to it on the composite key attaches f(l_partkey, l_suppkey)
    with multiplicity 1. Computing the function directly on the fact
    row is algebraically identical and deletes a second lineitem
    scan, the distinct shuffle, and a composite-key shuffle join —
    the generated-column pushdown any optimizer with catalog
    knowledge would make. Q2/Q11/Q16/Q20 keep the real derived
    relation (they aggregate at pair granularity, where the distinct
    is load-bearing). part/supplier/nation broadcast; orders joins
    on the fact's orderkey (AQE picks the strategy at real sizes)."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "ps_supplycost", ps_supplycost_expr("l_partkey", "l_suppkey")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    joined = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == F.col("s_nationkey"))
        .join(o, o.o_orderkey == li.l_orderkey)
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification
# ---------------------------------------------------------------------------

_Q11_SQL = _PS_CTE + """,
nat AS (SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS v
        FROM partsupp ps JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        WHERE s.s_nationkey = 3),
tot AS (SELECT SUM(v) AS t FROM nat)
SELECT ps_partkey, ROUND(SUM(v), 2) AS value
FROM nat, tot GROUP BY ps_partkey, t HAVING SUM(v) > 0.001 * t
"""


@register("tpch_q11", _Q11_SQL)
def tpch_q11(spark, sf_dir):
    """Q11: parts whose nation-3 stock value exceeds 0.1% of the
    nation's total — a grouped aggregate gated on a global aggregate.
    The global total is one scalar (broadcast by construction); no
    second scan of partsupp at scale (the grouped table re-aggregates
    map-side)."""
    ps = derive_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    nat = ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
    )
    grouped = nat.groupBy("ps_partkey").agg(F.sum("v").alias("sv"))
    total = grouped.agg(F.sum("sv").alias("t"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("sv") > 0.001 * F.col("t"))
        .select("ps_partkey", F.round("sv", 2).alias("value"))
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (NOT IN exclusion)
# ---------------------------------------------------------------------------

_Q16_SQL = _PS_CTE + """
SELECT p.p_brand, p.p_type, p.p_size, COUNT(DISTINCT ps.ps_suppkey)::BIGINT AS supplier_cnt
FROM partsupp ps JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'SMALL%'
  AND p.p_size IN (1, 4, 7, 10, 14, 19, 25, 45)
  AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


@register("tpch_q16", _Q16_SQL)
def tpch_q16(spark, sf_dir):
    """Q16: distinct-supplier counts per (brand, type, size) slice,
    excluding a supplier denylist — the spec's comment-scraped set is
    adapted to negative account balances (the schema has no
    s_comment) to preserve the NOT IN anti-join shape."""
    ps = derive_partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("SMALL%")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 25, 45)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    return (
        ps.join(bad, "ps_suppkey", "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess stock of red parts
# ---------------------------------------------------------------------------

_Q20_SQL = _PS_CTE + """,
shipped AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
excess AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM partsupp ps
  JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE '%red%'
  LEFT JOIN shipped sh ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
  WHERE ps.ps_availqty > 0.5 * COALESCE(sh.qty, 0)
)
SELECT s.s_name, s.s_suppkey
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_2'
WHERE s.s_suppkey IN (SELECT ps_suppkey FROM excess)
"""


@register("tpch_q20", _Q20_SQL)
def tpch_q20(spark, sf_dir):
    """Q20: NATION_2 suppliers holding more than half a year's
    shipments of any red part. The spec's correlated scalar subquery
    is decorrelated into a pre-aggregated (partkey, suppkey) shipment
    table left-joined to the catalog — the form Catalyst would
    produce, written explicitly so the shuffle keys are visible."""
    li = _t(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    ps = derive_partsupp(spark, sf_dir)
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    excess = (
        ps.join(F.broadcast(red), ps.ps_partkey == F.col("p_partkey"))
        .join(
            shipped,
            (shipped.l_partkey == ps.ps_partkey)
            & (shipped.l_suppkey == ps.ps_suppkey),
            "left",
        )
        .filter(F.col("ps_availqty") > 0.5 * F.coalesce(F.col("qty"), F.lit(0.0)))
        .select("ps_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.ps_suppkey, "leftsemi")
        .select("s_name", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# agg_group_median — exact interpolated median per group
# ---------------------------------------------------------------------------

_GM_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS med_price,
       ROUND(quantile_cont(l_quantity, 0.25), 6) AS q1_qty,
       ROUND(quantile_cont(l_quantity, 0.75), 6) AS q3_qty
FROM lineitem GROUP BY 1, 2
"""


@register("agg_group_median", _GM_SQL)
def agg_group_median(spark, sf_dir):
    """Exact per-group medians/quartiles: Spark's `percentile` and
    DuckDB's `quantile_cont` both use the linearly-interpolated
    (type-7) definition, so the comparison is value-exact after the
    documented ROUND(6) float policy. One shuffle on the group key;
    the sort happens within each group's partition."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("med_price"),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("q1_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("q3_qty"),
    )


# ---------------------------------------------------------------------------
# fn_bit_ops — row-level bitwise expression coverage
# ---------------------------------------------------------------------------

_BIT_SQL = """
SELECT o_orderkey,
       (o_orderkey & 255)::BIGINT AS lo_byte,
       (o_orderkey | 4096)::BIGINT AS with_flag,
       xor(o_orderkey, o_custkey)::BIGINT AS key_xor,
       (o_orderkey << 2)::BIGINT AS shifted_l,
       (o_orderkey >> 3)::BIGINT AS shifted_r,
       bit_count(o_orderkey)::BIGINT AS popcount
FROM orders WHERE o_orderkey < 5000
"""


@register("fn_bit_ops", _BIT_SQL)
def fn_bit_ops(spark, sf_dir):
    """Row-level bitwise algebra (&, |, xor, shifts, popcount) — the
    partition-key / flag-mask toolbox. Pure map-side expressions in
    whole-stage codegen."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("lo_byte"),
        k.bitwiseOR(F.lit(4096)).cast("long").alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).cast("long").alias("key_xor"),
        F.shiftleft(k, 2).cast("long").alias("shifted_l"),
        F.shiftright(k, 3).cast("long").alias("shifted_r"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


# ---------------------------------------------------------------------------
# fn_variant — Spark 4 VARIANT ingestion of semi-structured props
# ---------------------------------------------------------------------------

_VARIANT_SQL = """
SELECT event_id,
       json_extract(props, '$.k')::BIGINT AS k,
       (json_extract(props, '$.k')::BIGINT % 7)::BIGINT AS k_mod,
       CASE WHEN json_extract(props, '$.k')::BIGINT >= 50 THEN 'hi' ELSE 'lo' END AS band
FROM events WHERE event_id < 5000
"""


@register("fn_variant", _VARIANT_SQL)
def fn_variant(spark, sf_dir):
    """Semi-structured ingestion through Spark 4's VARIANT type:
    parse_json into a variant column once, then typed variant_get
    path extraction — the open-format answer to schema-on-read JSON
    (binary-encoded, no per-access re-parse, shredding-ready). The
    oracle is DuckDB's JSON path extraction over the same strings;
    `fn_json` keeps the classic get_json_object face."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return e.select(
        "event_id",
        k.alias("k"),
        (k % 7).alias("k_mod"),
        F.when(k >= 50, F.lit("hi")).otherwise(F.lit("lo")).alias("band"),
    )


# ---------------------------------------------------------------------------
# txlog_lifecycle — ACID table format end-to-end
# ---------------------------------------------------------------------------


def _scratch_table(sf_dir: str, tag: str, build, src_file: str = "orders.parquet") -> str:
    """Deterministic scratch txlog table keyed on (tag, sf_dir,
    source fingerprint), built once and REUSED by later invocations —
    repeated driver verification and bench iterations previously
    mkdtemp'd a fresh parquet copy of orders per call and never
    cleaned up (unbounded /tmp growth; the dirs can't be deleted
    eagerly because the returned plan reads them lazily).

    The key includes a FINGERPRINT of the source parquet (size +
    mtime of orders.parquet): the driver has regenerated
    /root/testdata in place across rounds, and a cache keyed on the
    path alone would keep serving tables built from data that no
    longer exists while the oracle reads the new parquet — every
    txlog query would hash-mismatch with no local signal. A new
    vintage gets a new directory; stale vintages and orphaned
    staging dirs of the same (tag, sf) are swept on the way.

    The build lands in a unique staging dir and is os.rename'd into
    place, so a concurrent builder of the same table can't observe a
    half-built lifecycle: one rename wins, the loser's staging copy
    is discarded."""
    import glob as _glob
    import shutil
    import tempfile
    import uuid as _uuid

    key = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    # fingerprint the parquet the BUILD actually reads (callers whose
    # scripted history reads a different table pass it via src_file —
    # a stale cache keyed on the wrong source would keep serving a
    # table built from data the oracle no longer sees)
    src = os.path.join(sf_dir, src_file)
    st = os.stat(src)
    fp = f"{st.st_size:x}.{st.st_mtime_ns:x}"
    base = os.path.join(tempfile.gettempdir(), f"stockify_txlog_{tag}_{key}")
    path = f"{base}_{fp}"
    if os.path.exists(os.path.join(path, "_COMPLETE")):
        return path
    # sweep stale vintages (and their crashed builders' staging
    # dirs); never touch the CURRENT fingerprint's namespace — a
    # concurrent builder of the same vintage may be mid-write there
    for old in _glob.glob(base + "_*"):
        if not old.startswith(path):
            shutil.rmtree(old, ignore_errors=True)
    staging = path + ".staging." + _uuid.uuid4().hex
    try:
        build(staging)
        with open(os.path.join(staging, "_COMPLETE"), "w") as f:
            f.write("ok")
        try:
            os.rename(staging, path)
        except OSError:  # lost the race — another process built it
            pass
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return path


def _lifecycle_table(spark, sf_dir: str) -> str:
    """The shared create→append→COW-delete→compact lifecycle table
    (versions 0..3) that txlog_lifecycle / txlog_time_travel /
    txlog_cdf all read — one build serves all three queries."""
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(
            o.filter(F.col("o_orderkey") % 2 == 0).repartitionByRange(4, "o_orderkey"),
            path,
        )
        txlog.append(
            o.filter(F.col("o_orderkey") % 2 == 1).repartitionByRange(4, "o_orderkey"),
            path,
        )
        v_del = txlog.delete_where(spark, path, F.col("o_orderkey") % 10 == 0)
        assert v_del == 2, v_del  # deterministic version layout
        txlog.compact(spark, path, target_partitions=2)

    return _scratch_table(sf_dir, "life", build)


_TXLOG_SQL = """
SELECT (o_orderkey % 7)::BIGINT AS bucket, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders WHERE o_orderkey % 10 <> 0 GROUP BY 1
"""


@register("txlog_lifecycle", _TXLOG_SQL)
def txlog_lifecycle(spark, sf_dir):
    """Full lifecycle of the log-structured ACID table format
    (sources/txlog.py): create from the even-key half, append the odd
    half, copy-on-write delete every 10th key, compact the small
    files, then aggregate the final snapshot. The oracle states the
    net effect declaratively over the source table — create+append
    covered every order, the delete removed keys divisible by 10 —
    so the whole commit-log replay (adds minus removes across four
    versions) is hash-checked. The scratch table is the shared
    deterministic lifecycle table (_lifecycle_table): built once per
    sf_dir, reused by repeat invocations and by time_travel/cdf."""
    from stockify_spark.sources import txlog

    path = _lifecycle_table(spark, sf_dir)
    snap = txlog.snapshot(spark, path)
    return snap.groupBy((F.col("o_orderkey") % 7).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


_TT_SQL = """
SELECT (o_orderkey % 5)::BIGINT AS bucket, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY 1
"""


@register("txlog_time_travel", _TT_SQL)
def txlog_time_travel(spark, sf_dir):
    """Time travel through the commit log: the same lifecycle as
    txlog_lifecycle, but reading the PRE-delete version (v1) — the
    snapshot must contain every order even though later commits
    removed and compacted files. Proves old versions stay readable
    and exact after destructive operations."""
    from stockify_spark.sources import txlog

    path = _lifecycle_table(spark, sf_dir)
    snap = txlog.snapshot(spark, path, version=1)  # pre-delete world
    return snap.groupBy((F.col("o_orderkey") % 5).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


_CDF_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
       'delete' AS _change_type
FROM orders WHERE o_orderkey % 10 = 0
"""


@register("txlog_cdf", _CDF_SQL)
def txlog_cdf(spark, sf_dir):
    """Change data feed of the COW-delete commit: the row-level
    changes are computed from that commit's own file actions (added
    minus removed rows cancel the copy-on-write survivors), so the
    feed contains exactly the deleted rows — which is what the
    declarative oracle states. Cost scales with the files the commit
    touched, not with table size."""
    from stockify_spark.sources import txlog

    path = _lifecycle_table(spark, sf_dir)
    cdf = txlog.changes(spark, path, 2)  # v2 = the COW-delete commit
    return cdf.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "_change_type"
    )


_SKIP_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_orderkey BETWEEN 100 AND 2000
"""


@register("txlog_skipping", _SKIP_SQL)
def txlog_skipping(spark, sf_dir):
    """Data-skipping read path: orders land in a clustered txlog
    table (compact with sort_by), then a range probe reads only the
    files whose LOG-stored min/max overlap the range — zero footer
    fetches for pruned files. The oracle is the plain range query;
    the pruning is proven exact because the residual filter applies
    regardless of stats."""
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(o, path)
        txlog.compact(spark, path, target_partitions=8, sort_by="o_orderkey")

    path = _scratch_table(sf_dir, "skip", build)
    pruned = txlog.snapshot_pruned(spark, path, "o_orderkey", 100, 2000)
    return pruned.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


# ---------------------------------------------------------------------------
# sample_weighted — Efraimidis-Spirakis A-Res, deterministic source
# ---------------------------------------------------------------------------

_WS_SQL = """
WITH keyed AS (
  SELECT o_orderkey, o_totalprice,
         ln((CAST(CONCAT('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13)) AS BIGINT) + 1.0)
            / 4503599627370497.0) / o_totalprice AS akey
  FROM orders
)
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM (SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY akey DESC, o_orderkey) AS rn
      FROM keyed)
WHERE rn <= 32
"""


@register("sample_weighted", _WS_SQL)
def sample_weighted(spark, sf_dir):
    """Weighted sample WITHOUT replacement (Efraimidis-Spirakis
    A-Res): each row draws u in (0,1) and keeps key = ln(u)/w; the
    top-k keys are the sample, with inclusion probability
    proportional to weight. The uniform is a SEEDED md5-derived
    value, so both engines draw identical u and the sample is
    hash-exact — the same deterministic-randomness policy as the
    MinHash family. One map-side key expression + a top-k (no global
    sort: TakeOrdered merges per-partition heaps)."""
    o = _t(spark, sf_dir, "orders")
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 13), 16, 10)
        .cast("double")
        + 1.0
    ) / 4503599627370497.0  # 2^52 + 1 keeps u in (0, 1]
    akey = F.ln(u) / F.col("o_totalprice")
    return (
        o.select("o_orderkey", "o_totalprice", akey.alias("akey"))
        .orderBy(F.col("akey").desc(), "o_orderkey")
        .limit(32)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


# ---------------------------------------------------------------------------
# txlog_timestamp_travel — TIMESTAMP AS OF through in-commit timestamps
# ---------------------------------------------------------------------------

_TTS_SQL = """
SELECT (o_orderkey % 6)::BIGINT AS bucket, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
"""


@register("txlog_timestamp_travel", _TTS_SQL)
def txlog_timestamp_travel(spark, sf_dir):
    """TIMESTAMP AS OF time travel (sources/txlog.version_at_timestamp
    + snapshot(timestamp_ms=...)): build a two-commit table (create
    the even-key half, append the odd half), read it AS OF the
    in-commit timestamp of version 0, and aggregate — the snapshot
    must contain exactly the even keys even though the head holds
    all of them. Timestamps are strictly monotone (max(now, prev+1),
    Delta's In-Commit Timestamps rule), so resolution is a binary
    search of the commit range; the oracle states version 0's world
    declaratively over the source table. Own scratch tag: the shared
    lifecycle table may predate in-commit timestamps."""
    from stockify_spark.sources import txlog

    def build(path: str) -> None:
        o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        txlog.create(
            o.filter(F.col("o_orderkey") % 2 == 0).repartitionByRange(2, "o_orderkey"),
            path,
        )
        txlog.append(
            o.filter(F.col("o_orderkey") % 2 == 1).repartitionByRange(2, "o_orderkey"),
            path,
        )

    path = _scratch_table(sf_dir, "tsasof", build)
    ts0 = txlog.commit_timestamp(path, 0)
    snap = txlog.snapshot(spark, path, timestamp_ms=ts0)
    return snap.groupBy((F.col("o_orderkey") % 6).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )
