"""qvarn_mr_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vaultit/qvarn-mr.

The reference (read-only at /root/reference) is an incremental map/reduce
materialized-view service over a RESTful JSON store. This package re-expresses
every capability Spark-first:

- ``catalog``   — named typed collections (resource types) as DataFrames
                  (reference: qvarn prototypes, ``[qvarn] schema.py``)
- ``query``     — the ``field__method`` search surface (reference:
                  ``clients/qvarn.py:211-273``, ``[qvarn] read_only.py``)
                  compiled to Catalyst expressions
- ``operators`` — map/reduce view engine (reference: ``processor.py``,
                  ``func.py``), batch full-recompute + incremental maintenance
- ``functions`` — scalar/text/dedup/similarity function library
- ``sources``   — parquet/json/CDC feed readers
- ``streaming`` — incremental CDC application (reference: worker loop)
"""

from qvarn_mr_spark.session import get_spark
from qvarn_mr_spark.catalog import Catalog, load_tables

__all__ = ["get_spark", "Catalog", "load_tables"]

__version__ = "0.1.0"
