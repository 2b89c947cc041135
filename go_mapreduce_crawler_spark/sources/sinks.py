"""Sinks — the reference has none (scalar return only, crawler.go:253);
the engine provides the standard Spark writers with scale-aware defaults.

Guidance encoded here:
* parquet is the default interchange format (columnar, predicate-
  pushdown-able on re-read);
* `partition_by` produces hive-style directory partitioning so later
  reads prune partitions from the path alone;
* writers repartition to a bounded file count first — at 100 TB the
  failure mode is millions of tiny files from over-parallel writes
  (or one giant file from coalesce(1));
* bucketed saveAsTable co-locates future joins on the bucket key
  (no shuffle on re-join) — the Spark analogue of a clustered index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str,
                  partition_by: list[str] | None = None,
                  n_files: int | None = None,
                  mode: str = "overwrite") -> None:
    if n_files:
        df = (df.repartition(n_files, *partition_by)
              if partition_by else df.repartition(n_files))
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32, mode: str = "overwrite") -> None:
    """Bucketed managed table: joins/aggs on bucket_col skip the shuffle."""
    (df.write.mode(mode)
       .bucketBy(n_buckets, bucket_col)
       .sortBy(bucket_col)
       .format("parquet")
       .saveAsTable(table))


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — same columnar/pushdown properties as parquet via
    Spark's native vectorized ORC reader/writer; provided for
    Hive-ecosystem interchange."""
    df.write.mode(mode).orc(path)
