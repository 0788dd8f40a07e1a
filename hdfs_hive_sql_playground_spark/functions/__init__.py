"""Hive-dialect function shims.

The reference passes arbitrary HiveQL to Hive 3.1.2 (``playground.py:745-750``),
so any Hive builtin missing from Spark SQL must be filled in. The example
workload uses exactly one such function: ``field()``
(``create_m33_schem_view.hql:12``).

``field(x, v1, v2, ...)`` returns the 1-based index of ``x`` in the value
list, 0 if absent (MySQL/Hive semantics). Spark's JVM-side equivalent is
``array_position(array(v1, v2, ...), x)`` — identical contract — so the
preferred path is the SQL rewrite in :mod:`..dialect`, which stays inside
whole-stage codegen. The Python UDF registered here is a compatibility
fallback for sessions that call ``spark.sql`` directly without the dialect
shim; it is NOT used in any hot path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import IntegerType


def _field(x, *values) -> int:
    if x is None:
        return 0
    for i, v in enumerate(values):
        if v == x:
            return i + 1
    return 0


def register_all(spark: SparkSession) -> None:
    spark.udf.register("field", _field, IntegerType())
