"""Data-layout writers: sort and partition parquet for scan pruning.

The reference accelerates selective scans with RAM-resident integer indexes
(src/indexing/IntIndex.java) rebuilt per session. At 100 TB the Spark-native
equivalent is *layout*: make the parquet files themselves the index.

- :func:`write_range_sorted` — ``repartitionByRange`` + ``sortWithinPartitions``
  on the hot filter column(s). Every output file then covers a narrow,
  non-overlapping value range, so parquet row-group min/max statistics let a
  pushed-down predicate skip all but the matching files — the same
  I/O-elision an index gives, with zero serving-time state.
- :func:`write_hive_partitioned` — directory-level ``partitionBy`` on a
  LOW-cardinality derived key (e.g. month). Catalyst prunes partitions at
  planning time (``PartitionFilters`` in the scan node) without touching file
  footers. Rule of thumb encoded in the guard: keep partition count in the
  thousands, never per-high-cardinality-key (millions of tiny directories
  destroy listing and small-file performance).

Composed, these are the standard warehouse layout: partition by coarse time,
range-sort by the secondary filter key inside each partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_range_sorted(
    df: DataFrame, path: str, cols: list[str], n_files: int = 32
) -> None:
    """Persist parquet range-partitioned + sorted on ``cols`` so row-group
    min/max stats make pushed-down filters on those columns skip files."""
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str,
    max_partitions: int = 10_000,
) -> None:
    """Persist parquet with directory-level partitioning on a coarse key.

    Refuses high-cardinality keys: each distinct value becomes a directory,
    and at warehouse scale millions of partitions turn listing+planning into
    the bottleneck (and every partition into small files).
    """
    n = df.select(partition_col).distinct().count()
    if n > max_partitions:
        raise ValueError(
            f"partition column {partition_col!r} has {n} distinct values "
            f"(> {max_partitions}); partition on a coarser derived key "
            "(e.g. month, source bucket) and range-sort within partitions"
        )
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet read; filters applied by the caller reach the scan as
    ``PushedFilters`` / ``PartitionFilters`` (asserted in tests/test_scale.py)."""
    return spark.read.parquet(path)
