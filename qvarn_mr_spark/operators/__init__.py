from qvarn_mr_spark.operators.mapreduce import (
    ViewEngine,
    map_item,
    map_expr,
    reduce_count,
    reduce_agg,
    reduce_join,
    reduce_pandas,
)
from qvarn_mr_spark.operators.incremental import IncrementalEngine, ParquetStateStore

__all__ = [
    "ViewEngine",
    "map_item",
    "map_expr",
    "reduce_count",
    "reduce_agg",
    "reduce_join",
    "reduce_pandas",
    "IncrementalEngine",
    "ParquetStateStore",
]
