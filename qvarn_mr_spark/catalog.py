"""Catalog: named typed collections (the reference's "resource types").

Reference model: a resource type is a named collection of JSON documents with
a declared prototype and system fields ``id``/``type``/``revision``
(``/root/reference/qvarnmr/testing/realqvarn.py:20-27``,
``[qvarn] schema.py:23-47``). Here a resource type is simply a DataFrame with
a StructType schema; nested list fields are native ``ArrayType`` columns
instead of the reference's flattened side tables (``[qvarn] schema.py:56-115``)
— Spark stores nesting natively, so the whole flattening subsystem is dropped
(SURVEY.md §1.3).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver generates at each scale factor (TESTDATA.md).
TESTDATA_TABLES = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables=TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the driver's parquet tables as a dict of DataFrames.

    Reads are plain ``spark.read.parquet`` so Catalyst's predicate pushdown,
    column pruning and partition pruning all apply to downstream queries.
    """
    # The driver may hand us a session built without the ns-timestamp conf
    # (events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects);
    # it is runtime-settable, so set it here rather than only at build time.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Likewise ship this package to executor workers for sessions we didn't
    # build (UDF closures reference package functions by module path).
    from qvarn_mr_spark.session import ship_package
    ship_package(spark)
    out = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = _normalize(spark.read.parquet(path))
    return out


def _normalize(df: DataFrame) -> DataFrame:
    """Convert nanosecond-epoch long columns (read via
    ``spark.sql.legacy.parquet.nanosAsLong`` — see session.py) to
    microsecond timestamps. Only the driver's ``events.ts`` is affected;
    detection is by name+type so other tables pass through untouched."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if "ts" in df.columns and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer `div`, not `/`: float division of an ~1.7e18 ns epoch loses
        # sub-µs precision (double mantissa ≈ 9e15) and drifts vs engines
        # that truncate exactly. Target TIMESTAMP_NTZ (UTC wall clock), the
        # same type current testdata reads natively, so downstream operators
        # see one timestamp type under any session timezone.
        df = df.withColumn(
            "ts",
            F.timestamp_add(
                "MICROSECOND", F.expr("ts div 1000"),
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")))
    return df


@dataclass
class Catalog:
    """A registry of resource types → DataFrames.

    The map/reduce engine resolves handler source names through this, the
    same way the reference resolves resource-type paths through its Qvarn
    client (``clients/qvarn.py:104-131``).
    """

    spark: SparkSession
    tables: dict[str, DataFrame] = field(default_factory=dict)

    @classmethod
    def from_dir(cls, spark: SparkSession, sf_dir: str) -> "Catalog":
        return cls(spark=spark, tables=load_tables(spark, sf_dir))

    def register(self, name: str, df: DataFrame) -> None:
        self.tables[name] = df

    def get(self, name: str) -> DataFrame:
        if name not in self.tables:
            raise KeyError(f"unknown resource type: {name!r}")
        return self.tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self.tables


def table_profile(df: DataFrame, columns: list[str] | None = None):
    """ANALYZE-style per-column statistics in ONE aggregate pass:
    ``(column, n_rows, n_null, n_distinct, min_val, max_val)`` — null
    counts and exact distinct counts for every column, min/max for the
    numeric ones (as double; NULL otherwise).

    The multi-``count_distinct`` aggregate runs as Spark's expand+agg
    (|cols| rows per input row map-side, partially aggregated before the
    shuffle); for approximate profiling of very wide tables at 100 TB,
    swap the exact distinct for the HLL rollup in
    :mod:`qvarn_mr_spark.functions.sketches` — this exact form is the
    oracle-checkable one and the planner-statistics shape (join
    reordering, broadcast decisions) that ANALYZE feeds."""
    from pyspark.sql import functions as F

    cols = columns if columns is not None else df.columns
    numeric = {f.name for f in df.schema.fields
               if f.dataType.typeName() in
               ("byte", "short", "integer", "long", "float", "double",
                "decimal")}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1))
                    .alias(f"_null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_max_{c}"))
    row = df.agg(*aggs)
    parts = []
    for c in cols:
        mn = f"_min_{c}" if c in numeric else None
        parts.append(F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_null"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            (F.col(mn) if mn else F.lit(None).cast("double"))
            .alias("min_val"),
            (F.col(f"_max_{c}") if mn else F.lit(None).cast("double"))
            .alias("max_val")))
    return (row.select(F.explode(F.array(*parts)).alias("s"))
            .select("s.*"))
