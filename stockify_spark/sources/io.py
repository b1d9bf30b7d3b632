"""Readers/writers for the engine's tables.

The reference's only source is a hard-coded positional CSV parse into
an array-of-structs (stockify.cu:32-71); its only "sink" is stdout.
Here sources are schema'd DataFrame readers (Parquet first — columnar,
predicate-pushdown, column-pruned) and sinks are Parquet writers with
optional sorted layout (the index-as-storage-layout replacement for
the reference's runtime indexes, stockify.cu:659-727; SURVEY §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# The driver's star-schema tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Explicit schema for the reference's own table shape (stockify.cu:21-28
# struct StockData + FIXTURES.md §A). ``row_id`` materializes the CSV
# file order the reference's window ops implicitly depend on.
STOCKS_SCHEMA = T.StructType(
    [
        T.StructField("row_id", T.LongType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("close", T.DoubleType(), False),
        T.StructField("volume", T.DoubleType(), False),
        T.StructField("open", T.DoubleType(), False),
        T.StructField("high", T.DoubleType(), False),
        T.StructField("low", T.DoubleType(), False),
    ]
)

# CSV surface of the reference input (no row_id column in the file;
# column order is baked into the parse at stockify.cu:44-63).
STOCKS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("date", T.StringType(), False),
        T.StructField("close", T.DoubleType(), False),
        T.StructField("volume", T.DoubleType(), False),
        T.StructField("open", T.DoubleType(), False),
        T.StructField("high", T.DoubleType(), False),
        T.StructField("low", T.DoubleType(), False),
    ]
)


# Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
# reader rejects. We read them as raw nanos (legacy conf) and convert
# with integer division — a double division would lose precision at
# ~1.7e18 ns — matching DuckDB's nanos→micros truncation.
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Fallback for sessions not built by :mod:`stockify_spark.session`
    (the verification driver uses a vanilla SparkSession): the nanos
    conf has no per-read datasource option, so it must be session
    conf. This set is idempotent (constant value, checked first, never
    varied or unset), so concurrent callers all write the same value
    and nothing order-dependent leaks into other reads — it only
    changes the handling of TIMESTAMP(NANOS) columns, which error
    without it."""
    try:
        current = spark.conf.get(_NANOS_CONF)
    except Exception:
        current = None
    if current != "true":
        spark.conf.set(_NANOS_CONF, "true")


def _ensure_utc(spark: SparkSession) -> None:
    """Pin the session timezone to UTC for sessions not built by
    :mod:`stockify_spark.session` (the verification driver uses a
    vanilla SparkSession). The NTZ→LTZ normalization in
    :func:`load_table` and every epoch-valued expression assume the
    DuckDB-equivalent naive-UTC reading; like :func:`_ensure_nanos_conf`
    this set is idempotent and constant-valued."""
    tz_conf = "spark.sql.session.timeZone"
    try:
        current = spark.conf.get(tz_conf)
    except Exception:
        current = None
    if current != "UTC":
        spark.conf.set(tz_conf, "UTC")


def _ensure_ltz(spark: SparkSession) -> None:
    """Pin ``spark.sql.timestampType`` to TIMESTAMP_LTZ. Under a
    session that defaults the type to TIMESTAMP_NTZ, ``cast(x AS
    TIMESTAMP)`` and string→timestamp literals resolve to NTZ, which
    (a) makes the NTZ→LTZ normalization below a silent no-op and
    (b) breaks every epoch function downstream (``unix_millis`` & co.
    reject NTZ). BENCH_r05 hit exactly this in the harness's session.
    Idempotent constant-valued set, same contract as
    :func:`_ensure_utc`; with the session timezone pinned to UTC the
    LTZ reading is value-identical to DuckDB's naive reading."""
    type_conf = "spark.sql.timestampType"
    try:
        current = spark.conf.get(type_conf)
    except Exception:
        current = None
    if current != "TIMESTAMP_LTZ":
        spark.conf.set(type_conf, "TIMESTAMP_LTZ")


def load_table(
    spark: SparkSession, sf_dir: str, name: str, float32: bool = False
) -> DataFrame:
    """Load one star-schema table from a scale-factor directory.

    ``float32=True`` is the reference-fidelity mode (SURVEY §1.3): the
    reference computes in float32 (stockify.cu:21-28 StockData floats,
    :135-138 float atomics). Every double column is cast to float —
    IEEE round-to-nearest, identical in any engine, so the INPUT
    quantization is reproduced exactly. The reference's float32
    ACCUMULATOR drift is deliberately not reproduced: both Spark and
    DuckDB promote float sums to double accumulators (and the
    reference's atomic-add ordering is nondeterministic anyway) —
    double-not-float32 accumulation is the documented policy."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = NANOS_TS_COLS.get(name, ())
    if nanos_cols:
        _ensure_nanos_conf(spark)
    _ensure_utc(spark)
    _ensure_ltz(spark)
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    for c in nanos_cols:
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    # Normalize naive parquet timestamps to TIMESTAMP (LTZ). Newer
    # writers emit TIMESTAMP(MICROS, isAdjustedToUTC=false), which
    # Spark 4 infers as TIMESTAMP_NTZ — a type many epoch functions
    # (unix_millis & co.) reject. The session timezone is pinned to
    # UTC (session.py), so this cast is value-identical to the naive
    # reading DuckDB uses and to what earlier data vintages produced.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            # T.TimestampType() is the LTZ type OBJECT — unlike the
            # string "timestamp", it cannot be re-resolved to NTZ by
            # spark.sql.timestampType, so this cast is conf-proof.
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    if float32:
        for c, t in df.dtypes:
            if t == "double":
                df = df.withColumn(c, F.col(c).cast("float"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so each operator is also
    reachable through ``spark.sql`` (SURVEY §3.4 entry point B)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_stocks_csv(spark: SparkSession, path: str) -> DataFrame:
    """Schema'd CSV read of the reference's input file.

    Mirrors ``loadStocks`` (stockify.cu:32-71): explicit schema (no
    inference — the reference's schema is positional and fixed),
    header skipped, FAILFAST like ``std::stof`` throwing on malformed
    rows. Adds no row_id — CSV has no stable order guarantee across
    partitioned reads; use :func:`with_row_id` right after ingest if
    window order matters.
    """
    return (
        spark.read.schema(STOCKS_CSV_SCHEMA)
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def with_row_id(df: DataFrame) -> DataFrame:
    """Materialize a monotonically increasing row id.

    Spark has no implicit row order (SURVEY §7.4); the id is unique
    and increasing with partition order, which for a single-file CSV
    read reproduces file order.
    """
    from pyspark.sql import functions as F

    return df.withColumn("row_id", F.monotonically_increasing_id())


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Bucketing pre-shuffles the data ONCE at write time: two tables
    bucketed on the same key with the same bucket count join with NO
    exchange on either side — at 100 TB that converts the nightly
    orders⋈lineitem from a cluster-wide shuffle into a zip of
    co-located buckets. Requires ``saveAsTable`` (bucket metadata
    lives in the catalog, not the parquet files).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    granularity: str = "month",
    partition_col: str = "p_date",
) -> None:
    """Persist hive-partitioned by a truncated date of ``ts_col``.

    Directory-level partition pruning is the coarse sibling of
    row-group skipping: a query filtering on ``partition_col`` never
    lists, opens, or schedules the other partitions' files — the
    first lever against a 100 TB scan.
    """
    from pyspark.sql import functions as F

    (
        df.withColumn(partition_col, F.to_date(F.date_trunc(granularity, ts_col)))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_sorted_layout(df: DataFrame, path: str, sort_col: str, num_partitions: int | None = None) -> None:
    """Persist a range-sorted Parquet layout keyed on ``sort_col``.

    The Spark-idiomatic replacement for the reference's sorted-vector
    / map indexes (stockify.cu:659-666, 710-717): row-group min/max
    statistics over range-sorted files let the scan skip row groups
    for ``sort_col >= k`` probes — the ``lower_bound`` seek
    (stockify.cu:674) becomes storage-level data skipping. At 100 TB
    this is the difference between reading every file and reading the
    tail of the range partitioning.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def _morton_code(a_bucket, b_bucket, bits: int = 16):
    """Interleave the low ``bits`` of two bucket ids into a Z-order
    (Morton) key, as a pure column expression."""
    from pyspark.sql import functions as F

    code = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a_bucket, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b_bucket, i).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return code


def write_zorder_layout(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    buckets: int = 1024,
    num_partitions: int | None = None,
) -> None:
    """Persist Z-ordered on two columns: rank each column into
    ``buckets`` quantile buckets, interleave the bucket bits into a
    Morton key, range-partition + sort by it.

    A single-column sort gives perfect row-group skipping on that
    column and none on any other; Z-order trades a little of the
    first for usable min/max locality on BOTH — the standard layout
    when two probe dimensions matter (e.g. time × price). The key is
    layout-only and dropped from the written schema.

    Buckets are uniform-width over each column's [min, max] — the
    only global state is four scalars from one partial/final agg
    (scale-free); value skew is rebalanced by the z-key range
    partitioner, which samples actual key density.
    """
    from pyspark.sql import functions as F

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]

    def bucket_of(col: str, lo, hi):
        if hi == lo:
            return F.lit(0).cast("long")
        scaled = (F.col(col) - F.lit(lo)) / F.lit(float(hi - lo)) * buckets
        return F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(buckets - 1))

    with_key = df.withColumn(
        "_z", _morton_code(bucket_of(col_a, lo_a, hi_a), bucket_of(col_b, lo_b, hi_b))
    )
    (
        with_key.repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )



def write_parquet_observed(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    metrics: dict[str, "object"] | None = None,
) -> dict:
    """Write parquet and return pipeline metrics observed DURING the
    write — at 100 TB a row count is otherwise a second full scan.

    ``metrics`` maps metric name → aggregate Column (defaults to a
    row count). Uses ``df.observe``: the aggregates ride the write
    job's tasks, so the numbers are exact for exactly the rows
    written, at zero extra passes.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    metrics = metrics or {"rows_written": F.count(F.lit(1))}
    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.mode(mode).parquet(path)
    return obs.get


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Schema'd JSON-lines reader with an EXPLICIT malformed-record
    policy — the raw-crawl ingestion surface (WARC extractions, API
    dumps) where some fraction of lines is always broken and the
    pipeline must choose, not inherit, what happens to them:

    * ``PERMISSIVE`` (default): malformed lines become rows whose
      data columns are NULL and whose raw text lands in
      ``corrupt_col`` (added to the schema here if absent) — the
      quarantine-and-continue shape: route ``corrupt_col IS NOT
      NULL`` rows to a reject sink and keep the good ones flowing.
    * ``DROPMALFORMED``: silently discard broken lines (acceptable
      only when a loss metric is recorded elsewhere).
    * ``FAILFAST``: abort on the first broken line (reference-data
      loads where corruption means the upload itself failed).

    Schema is REQUIRED, never inferred: inference needs an extra
    full pass over 100 TB and silently widens types per batch.

    Spark quirk, pinned in tests: a query referencing ONLY the
    corrupt column is disallowed (the parser would never be
    exercised) — select data columns alongside it, or cache first.
    """
    from pyspark.sql import types as T

    s = schema
    if mode.upper() == "PERMISSIVE" and corrupt_col not in s.fieldNames():
        s = s.add(T.StructField(corrupt_col, T.StringType(), True))
    return (
        spark.read.schema(s)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
