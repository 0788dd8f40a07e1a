"""Data sources: schema-on-read external text tables (with partition
registration and per-file header skip) and JDBC export/read-back.

Spark-first replacements for the reference's HDFS-ingest + Hive external
table + Sqoop layers (SURVEY.md §2 A1-A4, A19-A26).
"""
