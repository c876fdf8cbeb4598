"""Sink-side layout: partitioned and bucketed table writers.

The reference's only sink is REST-POST-per-row; on Spark the sink layout IS
the performance contract for everything downstream:

- **partitioned parquet** (`write_partitioned`) — one directory per
  partition value; any later filter on the partition column becomes
  *partition pruning* (whole directories skipped before a byte is read —
  ``PartitionFilters`` in the scan, asserted in tests/test_layout.py).
- **bucketed tables** (`write_bucketed`) — rows pre-hashed into N buckets
  by the join/agg key; two tables bucketed the same way join with ZERO
  shuffle exchanges (asserted in tests). This is how a 100 TB fact⋈fact
  join avoids re-shuffling either side every query: pay the shuffle once
  at write time.

Bucketing metadata lives in the session catalog (``saveAsTable``); on a
real deployment this is the metastore/Delta catalog — same API.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_by: list[str],
                      mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet: ``path/col=value/…``."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_by: list[str],
                   num_buckets: int = 16,
                   sort_by: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed (+optionally sorted) parquet table registered in the
    session catalog. Joins/aggregations on ``bucket_by`` between tables
    with identical bucketing need no shuffle."""
    if mode == "overwrite":
        # saveAsTable(overwrite) still refuses a leftover managed-table
        # location whose catalog entry died with a previous session — clear
        # both the entry and the directory
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(wh.removeprefix("file:"), table.lower())
        shutil.rmtree(loc, ignore_errors=True)
    w = (df.write.mode(mode).format("parquet")
         .bucketBy(num_buckets, *bucket_by))
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)
