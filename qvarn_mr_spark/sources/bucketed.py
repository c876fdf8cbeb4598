"""Bucketed table materialization: pay the join shuffle once, at write time.

The reference re-reads its source collections over HTTP for every handler
pass (``qvarnmr/processor.py`` iterates resources per change); there is no
notion of a physical layout that makes the *next* join cheaper. At 100 TB
that is the difference between a pipeline and a science project: every
``groupBy``/``join`` on an unorganized fact table is a full shuffle of the
big side, and a corpus that is joined on the same key by N downstream jobs
pays that shuffle N times.

Spark's answer is hash-bucketed tables (``DataFrameWriter.bucketBy``):

- **Write once**: rows are hash-partitioned into a fixed number of buckets
  on the join key and each bucket is optionally sorted (``sortBy``), so the
  expensive exchange+sort happens exactly once, at materialization time.
- **Join forever after with ZERO exchange**: when both sides of an
  equi-join are bucketed on the join key with the same bucket count,
  Catalyst plans a sort-merge join with *no* Exchange on either side (and
  no Sort either, when ``sortBy`` matches the join key). The scan itself
  carries the required ``HashPartitioning`` distribution.
- **One-side benefit too**: a bucketed big side joined to a small side
  still saves the big side's shuffle (the small side re-shuffles to the
  bucket count), and ``groupBy`` on the bucket key is exchange-free.

At 100 TB: bucket the fact tables (lineitem/orders/documents) on their
dominant join key with a bucket count sized so one bucket ≈ one task's
memory (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket per table — pick
8-32k buckets in practice). Every downstream join, IVM pass, and dedup
group-by on that key then runs map-side. This module keeps the same API at
test scale with a handful of buckets.

Bucketing metadata lives in the session catalog, so tables are registered
via ``saveAsTable`` into a database whose LOCATION we control (no Hive
metastore needed — Spark's in-memory catalog tracks bucketing specs for the
session's lifetime; a production deployment would back the same calls with
a persistent metastore and the code is unchanged).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Database that holds all bucketed materializations. Data files live under
#: its LOCATION (a scratch dir), never inside the repo.
DEFAULT_DB = "qvarn_bucketed"
DEFAULT_LOCATION = os.environ.get(
    "SPARK_GRAFT_BUCKET_DIR", "/tmp/qvarn_bucketed_warehouse")


def ensure_db(spark: SparkSession, db: str = DEFAULT_DB,
              location: str = DEFAULT_LOCATION) -> str:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{location}'")
    # Let bucketed scans report their per-bucket sort order to the planner.
    # Spark gates this behind a conf because it is only sound with one file
    # per bucket — which materialize_bucketed guarantees (it repartitions to
    # exactly n_buckets write tasks). With it, a join of two tables bucketed
    # + sorted on the join key plans with ZERO Exchange and ZERO Sort.
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    return db


def materialize_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | tuple[str, ...],
    n_buckets: int,
    sort_cols: list[str] | tuple[str, ...] | None = None,
    db: str = DEFAULT_DB,
    overwrite: bool = False,
) -> str:
    """Write ``df`` as a parquet table bucketed on ``bucket_cols``.

    Returns the fully qualified table name. Idempotent per session: if the
    table already exists it is left untouched unless ``overwrite``. Bucket
    files are sorted by ``sort_cols`` (default: the bucket columns) so a
    later sort-merge join needs no Sort node either.
    """
    spark = df.sparkSession
    ensure_db(spark, db)
    fq = f"{db}.{table}"
    if spark.catalog.tableExists(fq):
        if not overwrite:
            return fq
        spark.sql(f"DROP TABLE {fq}")
    else:
        # The in-memory catalog forgets tables across sessions but their
        # scratch directories persist; a leftover dir from a previous
        # session would fail the managed-table write. It's our scratch
        # location — reclaim it. (A metastore-backed deployment never
        # hits this branch: the table stays registered.)
        import shutil
        loc = spark.catalog.getDatabase(db).locationUri
        if loc.startswith("file:"):
            shutil.rmtree(os.path.join(loc[len("file:"):], table),
                          ignore_errors=True)
    sort_cols = tuple(sort_cols or bucket_cols)
    # One write task per bucket => exactly one file per bucket. Without
    # this, every write task emits a file for every bucket it has rows
    # for (tasks x buckets small files at scale), and Spark only trusts
    # the sortBy metadata (eliding the reader-side Sort) when a bucket
    # is a single file.
    from pyspark.sql import functions as F
    df = df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
    (df.write.format("parquet")
       .bucketBy(n_buckets, *bucket_cols)
       .sortBy(*sort_cols)
       .mode("overwrite")
       .saveAsTable(fq))
    return fq


def read_bucketed(spark: SparkSession, table: str,
                  db: str = DEFAULT_DB) -> DataFrame:
    """Read a bucketed table back; the scan reports its bucketing to the
    planner (``spark.sql.sources.bucketing.enabled``, default on), which is
    what lets downstream joins/aggregations skip their Exchange."""
    return spark.table(f"{db}.{table}")


def bucketed_pair(
    left: DataFrame, right: DataFrame,
    left_key: str, right_key: str,
    n_buckets: int, name: str,
    db: str = DEFAULT_DB,
) -> tuple[DataFrame, DataFrame]:
    """Materialize both sides of a recurring equi-join, bucketed and sorted
    on their join keys with a shared bucket count, and return the re-read
    frames. Joining the pair on ``left_key == right_key`` plans with no
    Exchange and no Sort on either side — verified by
    ``tests/test_bucketed.py`` plan assertions."""
    spark = left.sparkSession
    lt = materialize_bucketed(left, f"{name}_l", (left_key,), n_buckets, db=db)
    rt = materialize_bucketed(right, f"{name}_r", (right_key,), n_buckets, db=db)
    return spark.table(lt), spark.table(rt)
