"""Hive-dialect function shims.

The reference passes arbitrary HiveQL to Hive 3.1.2 (``playground.py:745-750``),
so any Hive builtin missing from Spark SQL must be filled in. The example
workload uses exactly one such function: ``field()``
(``create_m33_schem_view.hql:12``).

``field(x, v1, v2, ...)`` returns the 1-based index of ``x`` in the value
list, 0 if absent or if ``x`` is NULL (MySQL/Hive semantics). The JVM-side
expression is ``coalesce(array_position(array(v1, ...), x), 0)`` — the
coalesce matters because ``array_position(arr, NULL)`` is NULL while
``field(NULL, ...)`` is 0. SQL text using ``field(...)`` is rewritten to
this form by :mod:`hdfs_hive_sql_playground_spark.dialect`, which keeps the
whole expression inside whole-stage codegen.

A row-at-a-time Python UDF would serialize every row through the Python
worker; it is therefore NOT registered by default. Call
``register_python_field_fallback`` only for ad-hoc sessions that bypass the
dialect rewrite and accept the cost.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def field(x: Column | str, *values) -> Column:
    """JVM-side Hive ``field()``: 1-based index of ``x`` in ``values``, else 0."""
    col = F.col(x) if isinstance(x, str) else x
    arr = F.array(*[v if isinstance(v, Column) else F.lit(v) for v in values])
    return F.coalesce(F.array_position(arr, col), F.lit(0)).cast("int")


def _field_py(x, *values) -> int:
    if x is None:
        return 0
    for i, v in enumerate(values):
        if v == x:
            return i + 1
    return 0


def register_python_field_fallback(spark: SparkSession) -> None:
    """Opt-in per-row Python ``field`` for sessions without the dialect shim."""
    spark.udf.register("field", _field_py, IntegerType())
