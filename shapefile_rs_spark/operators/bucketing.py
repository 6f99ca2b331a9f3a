"""Bucketed (pre-partitioned) storage for shuffle-free co-located joins.

At 100 TB the dominant cost of the cell-equi PIP join (and any other
cell-keyed join) is shuffling the point table.  Writing the table BUCKETED
by ``cell_id`` moves that shuffle to write time, once: every subsequent
join against another table bucketed on the same key with the same bucket
count is exchange-free on both sides (Spark's bucketed SortMergeJoin), and
a join against an un-bucketed side only shuffles that side.

This is the storage-layout analog of the reference's shx-ordered file: the
data arrives pre-organized for the access path (src/reader.rs:412-468 uses
the index to avoid scanning; we use bucket layout to avoid shuffling).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "cell_id",
    n_buckets: int = 32,
    sort_col: Optional[str] = None,
    path: Optional[str] = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally sorted)
    by ``bucket_col``.  ``n_buckets`` should match the cluster's target
    join parallelism and MUST match between tables meant to co-join.
    ``path`` makes the table external (data at an explicit location)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_zordered(
    df: DataFrame,
    path: str,
    cell_col: str = "cell_id",
    n_files: int = 32,
) -> None:
    """Write parquet range-partitioned AND sorted by the Morton cell id —
    the data-skipping layout for spatial scans.

    Morton (Z-order) ids linearize 2-D locality, so range-partitioning by
    ``cell_col`` gives each output file a narrow, disjoint cell range and
    every parquet row group tight min/max stats.  A later scan filtered to
    a cell range (one polygon's covering, one tile's children) prunes all
    but the touching files at planning time and the touching row groups at
    read time — the parquet analog of the reference's shx-index seek
    (src/reader.rs:412-468: jump to the records you need, read nothing
    else).
    """
    (
        df.repartitionByRange(n_files, cell_col)
        .sortWithinPartitions(cell_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def cell_bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str = "cell_id",
) -> DataFrame:
    """Join two tables bucketed on ``on`` with equal bucket counts —
    plan-asserted exchange-free (tests/test_plans.py).  The merge hint
    keeps Spark from broadcasting small test tables so the bucketed path
    is the one exercised."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on=on, how="inner")


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    target_mb: int = 128,
    sort_col: Optional[str] = None,
) -> int:
    """Small-file compaction: rewrite a landing directory's parquet into
    ~``target_mb`` files (count estimated from the source footprint).
    Streaming sinks and per-task writers accumulate tiny files whose
    per-file open/footer cost dominates scans at scale; compaction is the
    standing maintenance job every table format schedules.

    ``sort_col`` additionally sorts within the output files (pair with the
    Morton cell id for the :func:`write_zordered` layout).  Returns the
    output file count.  Uses ``coalesce`` (no shuffle) unless sorting —
    ``repartitionByRange`` then pays one shuffle to buy the clustered
    layout."""
    import glob
    import os

    # recursive walk: a PARTITIONED source dir keeps its parquet under
    # key=value subdirs — a top-level glob would estimate 0 bytes and
    # coalesce everything to one file
    total = sum(
        os.path.getsize(os.path.join(base, name))
        for base, _, names in os.walk(src_dir)
        for name in names
        if name.endswith(".parquet")
    )
    n = max(1, round(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    if sort_col:
        df = df.repartitionByRange(n, sort_col).sortWithinPartitions(sort_col)
    else:
        df = df.coalesce(n)
    df.write.mode("overwrite").parquet(out_dir)
    return len(glob.glob(os.path.join(out_dir, "*.parquet")))
