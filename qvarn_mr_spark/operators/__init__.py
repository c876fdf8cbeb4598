from qvarn_mr_spark.operators.mapreduce import (
    ViewEngine,
    map_item,
    map_expr,
    reduce_count,
    reduce_agg,
    reduce_join,
    reduce_pandas,
)
from qvarn_mr_spark.operators.incremental import (
    BucketedParquetStateStore,
    EngineSnapshot,
    IncrementalEngine,
    ParquetStateStore,
)
from qvarn_mr_spark.operators.sessions import sessionize
from qvarn_mr_spark.operators.skew import salted_join, topk_per_key

__all__ = [
    "ViewEngine",
    "map_item",
    "map_expr",
    "reduce_count",
    "reduce_agg",
    "reduce_join",
    "reduce_pandas",
    "EngineSnapshot",
    "IncrementalEngine",
    "BucketedParquetStateStore",
    "ParquetStateStore",
    "sessionize",
    "salted_join",
    "topk_per_key",
]
