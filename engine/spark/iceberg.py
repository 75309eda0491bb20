"""Iceberg sink: MERGE INTO results table + snapshot-based lineage.

The north rule's production sink is an Iceberg table partitioned by
bucket(conv_id) with MERGE INTO upserts and per-partition lineage
manifests. The sandbox has no iceberg-spark-runtime jar, so this module
is code-complete but gated: ``iceberg_available(spark)`` probes for the
catalog classes and every entry point falls back cleanly (callers use
the plain-parquet sink in engine.spark.job, which preserves the same
idempotent-overwrite + checkpoint semantics).

To enable on a real cluster:
    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.local.type=hadoop \
      --conf spark.sql.catalog.local.warehouse=<warehouse-path> \
      --py-files engine.zip job.py
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

CATALOG = "local"
RESULTS_TABLE = f"{CATALOG}.db.extraction_results"
CHECKPOINT_TABLE = f"{CATALOG}.db.extraction_checkpoints"
METRICS_TABLE = f"{CATALOG}.db.extraction_metrics"


def iceberg_available(spark: "SparkSession") -> bool:
    """True iff an Iceberg catalog can actually be instantiated."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    return (
        spark.conf.get(f"spark.sql.catalog.{CATALOG}", None) is not None
    )


def ensure_tables(spark: "SparkSession") -> None:
    """DDL for the results/checkpoint/metrics tables; bucket(conv_id)
    partitioning bounds shuffle fan-in and enables partition pruning on
    conv_id point lookups."""
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CATALOG}.db")
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {RESULTS_TABLE} (
            conv_id STRING, turn_idx INT, role STRING, tool STRING,
            ts TIMESTAMP, payload_kind STRING, cleaned_text STRING,
            spans ARRAY<STRUCT<content: STRING, index: INT,
                start_char: BIGINT, end_char: BIGINT,
                estimated_tokens: INT>>,
            doc_type STRING, fields_json STRING,
            overall_confidence DOUBLE, quality_score DOUBLE,
            is_empty BOOLEAN, bytes_in BIGINT, part_id INT
        ) USING iceberg PARTITIONED BY (bucket(64, conv_id))
        """
    )
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {CHECKPOINT_TABLE} (
            run_id STRING, part_id INT, status STRING, n_turns BIGINT,
            snapshot_id BIGINT
        ) USING iceberg
        """
    )
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {METRICS_TABLE} (
            run_id STRING, part_id INT, n_turns BIGINT,
            bytes_parsed BIGINT, n_empty BIGINT, empty_rate DOUBLE,
            turns_per_sec DOUBLE
        ) USING iceberg
        """
    )


def merge_results(spark: "SparkSession", results: "DataFrame") -> None:
    """Idempotent upsert keyed on the stable turn identity. MERGE makes
    partition-slice re-commits after a crash exactly-once at row level
    (the parquet fallback gets the same property from dynamic partition
    overwrite)."""
    results.createOrReplaceTempView("_incoming_results")
    spark.sql(
        f"""
        MERGE INTO {RESULTS_TABLE} t
        USING _incoming_results s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )


def current_snapshot_id(spark: "SparkSession") -> int | None:
    rows = spark.sql(
        f"SELECT snapshot_id FROM {RESULTS_TABLE}.snapshots "
        "ORDER BY committed_at DESC LIMIT 1"
    ).collect()
    return rows[0].snapshot_id if rows else None


def commit_checkpoint(
    spark: "SparkSession", run_id: str, part_ids: list[int], n_turns: dict[int, int]
) -> None:
    """Checkpoint rows carry the Iceberg snapshot id as the lineage
    pointer: resume can verify the snapshot containing a partition's
    rows still exists before skipping it."""
    snap = current_snapshot_id(spark)
    rows = [
        (run_id, p, "done", int(n_turns.get(p, 0)), snap) for p in part_ids
    ]
    spark.createDataFrame(
        rows, "run_id string, part_id int, status string, n_turns long, snapshot_id long"
    ).writeTo(CHECKPOINT_TABLE).append()
