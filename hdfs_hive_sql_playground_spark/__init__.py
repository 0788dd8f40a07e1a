"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `hdfs-hive-sql-playground` (an HDFS + Hive +
Sqoop + MSSQL ELT pipeline), rebuilt Spark-first.

The reference (see SURVEY.md) is an orchestration layer over Hadoop/Hive/
Sqoop; this package re-expresses its entire capability surface on a single
SparkSession:

- schema-on-read external text tables with partitions and per-file header
  skipping (``sources.text``), with the m33 example pipeline in ``m33``,
- Hive-dialect SQL pass-through with dialect shims (``dialect``) behind the
  ``engine.Engine`` facade and its CLI (``cli``),
- materialization (CTAS) to delimited text / parquet warehouses (``sinks``),
- bulk parallel export to external RDBMS + DDL side-channel (``sources.jdbc``),
- the driver-checkable query registry with DuckDB oracles (``queries``),
- plus the large-scale training-data operators the reference never had:
  deduplication, similarity search, text analysis, multimodal columns
  (``queries.dedup`` / ``queries.similarity`` / ``queries.text`` /
  ``queries.multimodal``).
"""

from hdfs_hive_sql_playground_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
