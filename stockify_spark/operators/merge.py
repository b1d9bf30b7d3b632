"""Upsert / merge over plain Parquet (north-star: "Parquet/Delta
tables" — Delta's MERGE re-expressed as a DataFrame transformation,
since the Delta runtime isn't part of this container).

``merge_upsert`` is the logical MERGE: rows of ``base`` whose key
appears in ``updates`` are replaced, new keys are appended, and an
optional delete predicate drops rows. At table scale the physical
companion is partition-scoped rewrite: join the update keys to their
hive partitions and rewrite ONLY those partitions
(``upsert_partitioned`` below) — never the full 100 TB table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    delete_condition: Column | None = None,
) -> DataFrame:
    """MERGE semantics as one plan: anti-join base against update keys
    (matched rows drop out), union the updates back in, optionally
    delete. One shuffle of the key columns for the anti join; the
    update side is typically small enough to broadcast (Catalyst/AQE
    decides)."""
    if base.columns != updates.columns:
        raise ValueError(
            f"schema mismatch: base {base.columns} vs updates {updates.columns}"
        )
    keep = base.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = keep.unionByName(updates)
    if delete_condition is not None:
        merged = merged.filter(~delete_condition)
    return merged


def upsert_partitioned(
    spark,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> list:
    """Partition-scoped upsert into a hive-partitioned parquet table:
    only the partitions containing updated keys are read, merged, and
    rewritten (dynamic partition overwrite). Returns the partition
    values that were rewritten.

    This is the 100 TB write path: cost scales with the touched
    partitions, not the table. Requires
    spark.sql.sources.partitionOverwriteMode=dynamic for the rewrite
    to leave untouched partitions alone.
    """
    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not touched:
        return []
    base = spark.read.parquet(table_path).filter(F.col(partition_col).isin(touched))
    merged = merge_upsert(base, updates, key_cols)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(table_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return touched


def compact_small_files(
    spark,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Rewrite a parquet directory into ⌈rows/target⌉ files.

    Small-file proliferation (streaming sinks, per-trigger appends) is
    the quiet killer of 100 TB scans: every file costs a task + footer
    read + open. Compaction trades one rewrite for every future scan.
    Returns the new file count."""
    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, (n_rows + target_rows_per_file - 1) // target_rows_per_file)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_files
