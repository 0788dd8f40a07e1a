"""End-to-end training-data curation demo over the synthetic corpus.

Chains the registry's curation operators the way a real pretraining-data
build would, printing corpus size after each stage::

    python examples/run_curation_pipeline.py [sf_dir]

Stages (each is a registered, oracle-checked operator — see
docs/OPERATORS.md):

  1. quality gate        q91  (length / stopword-ratio keep flag)
  2. exact dedup         q80  (md5 groupBy, canonical doc per content)
  3. near-dup canonical  q116 (MinHash components, keep-longest)
  4. PII redaction       q114 (regexp_replace chain)
  5. decontamination     q108 (broadcast probe index anti-join)
  6. domain mixing       q115 (temperature-weighted token quotas)
  7. budget selection    q120 (global quality-ordered token cut)
  8. sequence packing    q112 + q121 (pack assignment + waste report)

Every stage is a DataFrame -> DataFrame plan: nothing collects to the
driver, so the same script scales from the 50-doc smoke fixture to a
cluster corpus unchanged.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import functions as F

    from hdfs_hive_sql_playground_spark.queries import all_queries
    from hdfs_hive_sql_playground_spark.session import get_spark

    spark = get_spark(app_name="curation-demo")
    q = {name: spec.fn for name, spec in all_queries().items()}

    total = q["q92_token_count"](spark, sf_dir).count()
    print(f"corpus: {total} documents")

    kept_quality = (
        q["q91_quality_score"](spark, sf_dir).filter(F.col("keep_flag") == 1).count()
    )
    print(f"1. quality gate keeps {kept_quality}")

    exact = q["q80_exact_dedup"](spark, sf_dir)
    print(f"2. exact dedup: {exact.count()} distinct contents, "
          f"{exact.agg(F.sum('n_removable')).collect()[0][0]} removable")

    canon = q["q116_canonical_per_cluster"](spark, sf_dir)
    print(f"3. near-dup canonicalization: {canon.count()} cluster decisions")

    redacted = q["q114_pii_redact"](spark, sf_dir)
    print(f"4. PII redaction: "
          f"{redacted.filter((F.col('n_emails') + F.col('n_ips')) > 0).count()} "
          "docs touched")

    decon = q["q108_decontaminate"](spark, sf_dir)
    print(f"5. decontamination: {decon.count()} clean docs")

    mix = q["q115_domain_mix_sample"](spark, sf_dir)
    print(f"6. domain mixing keeps {mix.filter(F.col('kept') == 1).count()}")

    sel = q["q120_budget_select"](spark, sf_dir)
    print(f"7. budget selection keeps {sel.filter(F.col('kept') == 1).count()}")

    stats = q["q121_pack_stats"](spark, sf_dir)
    waste = stats.agg(
        F.count("*").alias("packs"),
        F.sum(F.greatest(F.col("slack_tokens"), F.lit(0))).alias("slack"),
    ).collect()[0]
    print(f"8. packing: {waste['packs']} packs, {waste['slack']} slack tokens")


if __name__ == "__main__":
    main()
