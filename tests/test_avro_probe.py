"""Native spark-avro probe (VERDICT r2 task 5).

The reference's Hive 3.1.2 surface includes ``STORED AS AVRO`` tables;
the Hive-serde CTAS round-trip is covered in test_hive_ddl. Spark's
NATIVE avro reader/writer lives in the external ``spark-avro`` module,
which this pyspark distribution does not bundle and the container cannot
download. This probe proves the round-trip whenever the module IS present
(a real deployment adds ``--packages org.apache.spark:spark-avro_2.13``),
and otherwise asserts the exact failure mode so the absence is a tested,
documented environmental gap (SURVEY §8) rather than an unverified claim.
"""

from __future__ import annotations

import pytest


def test_native_avro_roundtrip_or_documented_absence(spark, tmp_path):
    df = spark.range(3).selectExpr("id", "CAST(id AS STRING) AS s")
    dest = str(tmp_path / "avro_out")
    try:
        df.write.format("avro").save(dest)
    except Exception as e:  # noqa: BLE001 — we assert the failure mode
        msg = str(e)
        assert "avro" in msg.lower() and (
            "Failed to find data source" in msg
            or "Failed to find the data source" in msg
        ), f"unexpected avro failure mode: {msg[:500]}"
        pytest.skip("native spark-avro module absent (documented in SURVEY §8): "
                    + msg.splitlines()[0][:200])
    back = spark.read.format("avro").load(dest)
    assert sorted(r.id for r in back.collect()) == [0, 1, 2]
    assert sorted(r.s for r in back.collect()) == ["0", "1", "2"]
