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
- **Z-ordered parquet** (`write_zordered`) — rows range-clustered along a
  Morton (bit-interleaved) space-filling curve over 2+ columns, so each
  file's min/max footer stats are tight in EVERY curve dimension at once;
  a selective filter on any of them skips most files/row-groups before a
  byte of data is read. This is the multi-column data-skipping layout
  Delta OPTIMIZE ZORDER / Iceberg sort orders provide — here on plain
  parquet, with layout quality asserted from the actual file footers.

Bucketing metadata lives in the session catalog (``saveAsTable``); on a
real deployment this is the metastore/Delta catalog — same API.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from qvarn_mr_spark.timeutil import ts_us


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


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton (Z-curve) key over ``cols``: each column is min-max scaled to
    a ``bits``-bit integer and the bits are interleaved.

    Scaling bounds come from one cheap per-column min/max aggregate (a
    single scan, no sort); timestamps go through tz-free epoch micros. The
    uniform scaling is skew-sensitive — a heavy-tailed column wastes curve
    resolution — but preserves locality regardless, which is all data
    skipping needs; Delta's OPTIMIZE ZORDER uses range-ids for the same
    reason and pays a per-column range partition to get them.

    The interleave is a flat JVM bit expression (``ncols·bits`` shift/or
    terms — inside whole-stage codegen, no UDF). Keep ``ncols·bits ≤ 60``
    so the key fits a long.
    """
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns")
    if len(cols) * bits > 60:
        raise ValueError(f"{len(cols)} cols x {bits} bits overflows a long")
    numeric = []
    for c in cols:
        dt = dict(df.dtypes)[c]
        numeric.append(ts_us(c, dt) if dt.startswith(("timestamp", "date"))
                       else F.col(c).cast("double"))
    bounds = df.agg(*[f(n).alias(f"{a}{i}")
                      for i, n in enumerate(numeric)
                      for a, f in (("lo", F.min), ("hi", F.max))]).first()
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, n in enumerate(numeric):
        # min/max come back None when df is empty or the column is all
        # NULL — no meaningful curve position; degenerate to span 0 (the
        # column contributes constant bits) instead of TypeError, so a
        # write that a plain .parquet() would handle still succeeds
        lo = bounds[f"lo{j}"]
        hi = bounds[f"hi{j}"]
        lo = float(lo) if lo is not None else 0.0
        span = (float(hi) - lo) if hi is not None else 0.0
        scaled = (F.least(
            F.lit(top),
            F.floor((n.cast("double") - F.lit(lo))
                    / F.lit(span if span > 0 else 1.0) * F.lit(top + 0.0))
        ).cast("long"))
        # NULL cell → curve position 0, keeping the whole key non-null
        scaled = F.coalesce(scaled, F.lit(0).cast("long"))
        for i in range(bits):
            bit = F.shiftright(scaled, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return z


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 16, num_files: int | None = None,
                   mode: str = "overwrite") -> None:
    """Write parquet clustered along the Z-curve of ``cols``.

    ``repartitionByRange`` on the curve key gives each output file a
    contiguous curve segment (one range shuffle — the same price as any
    global sort-write); within-file sort tightens row-group stats too.
    Readers need nothing special: parquet min/max footers + Spark's scan
    filters do the skipping.
    """
    z = zorder_key(df, cols, bits=bits)
    out = df.withColumn("_z", z)
    out = (out.repartitionByRange(num_files, "_z") if num_files
           else out.repartitionByRange("_z"))
    (out.sortWithinPartitions("_z").drop("_z")
        .write.mode(mode).parquet(path))
