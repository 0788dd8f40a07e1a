-- The reference's example workload, near-verbatim
-- (/root/reference/examples/src/hive/*.hql), runnable through
-- Engine.exec_sql with Hive support enabled.
--
-- Deviations from the reference text, both required by Spark SQL:
--   1. CREATE EXTERNAL TABLE requires an explicit LOCATION (Hive defaulted
--      to the warehouse dir; partitions below override it anyway).
--   2. Paths are templated as ${M33_DIR} (the reference hardcoded HDFS
--      paths; the runner substitutes the fixture directory).
--   3. The view's SELECT expressions carry explicit aliases: Spark refuses
--      CREATE_PERMANENT_VIEW_WITHOUT_ALIAS even with a view column list
--      (Hive derived them implicitly).
-- INPUT__FILE__NAME and field() are translated by the dialect shims.

CREATE EXTERNAL TABLE m33_raw (row_str STRING)
  COMMENT 'This is a comment'
  PARTITIONED BY (peculiarity STRING)
  ROW FORMAT DELIMITED
  STORED AS TEXTFILE
  LOCATION '${M33_DIR}'
  TBLPROPERTIES ("skip.header.line.count"="3");

ALTER TABLE m33_raw
  ADD PARTITION (peculiarity = 'cp')
  LOCATION '${M33_DIR}/cp';

ALTER TABLE m33_raw
  ADD PARTITION (peculiarity = 'nocp')
  LOCATION '${M33_DIR}/nocp';

CREATE VIEW m33_schem (age_mil, wavelength, flam, is_peculiar)
  AS
  SELECT
    cast(cleaned_data.age AS BIGINT) AS age_mil,
    cast(cleaned_data.data[0] AS DOUBLE) AS wavelength,
    cast(cleaned_data.data[1] AS DOUBLE) AS flam,
    cleaned_data.is_peculiar AS is_peculiar
  FROM (
    SELECT
      regexp_extract(INPUT__FILE__NAME, '(hmix\\.a)(\\d*)', 2) AS age,
      split(trim(row_str), '  ') AS data,
      field(peculiarity, 'nocp', 'cp') - 1 AS is_peculiar
    FROM m33_raw
  ) cleaned_data;

CREATE TABLE m33
ROW FORMAT DELIMITED
  FIELDS TERMINATED BY ','
STORED AS TEXTFILE
AS SELECT * FROM m33_schem
