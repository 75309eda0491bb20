"""Corpus-level observability over extraction output and run metrics.

Closes the loop the reference's per-request ExtractionMetrics
(extraction.py:53-103) can't: at table scale the interesting signal is
the *distribution* over time and partitions, not one request. Both
functions are pure native expressions (zero Python, map-side partial
aggregation).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def quality_drift(results: "DataFrame", window: str = "1 day") -> "DataFrame":
    """Quality/emptiness drift per event-time window: the signal a
    100 TB ingest watches to catch a corrupted source or a regressed
    extractor deploy. Groups by (time window, quality bucket) — the
    window comes from turn ts, so late/out-of-order data lands in the
    right bucket regardless of processing order.

    Rows with a null ts are excluded — they have no event-time window;
    count them upstream (split_valid routes null keys) rather than
    letting them collapse into a null-window group that downstream
    window_start arithmetic can't handle."""
    return (
        results.filter(F.col("ts").isNotNull())
        .groupBy(
            F.window("ts", window).alias("w"), F.col("quality_bucket")
        )
        .agg(
            F.count("*").alias("n_turns"),
            F.round(F.avg("quality_score"), 3).alias("avg_quality"),
            F.round(F.avg(F.col("is_empty").cast("double")), 6).alias("empty_rate"),
            F.round(F.avg("overall_confidence"), 4).alias("avg_confidence"),
            F.sum("bytes_in").alias("bytes_in"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "quality_bucket",
            "n_turns",
            "avg_quality",
            "empty_rate",
            "avg_confidence",
            "bytes_in",
        )
    )


def metrics_summary(spark: "SparkSession", out_dir: str) -> "DataFrame":
    """Per-run roll-up of the job's per-partition metrics table:
    totals, throughput percentiles across partitions, and the
    partition-skew ratio (max/median turns per partition) — the number
    that says whether the salted layout is actually balancing."""
    m = spark.read.parquet(f"{out_dir}/metrics")
    return m.groupBy("run_id").agg(
        F.count("*").alias("n_partitions"),
        F.sum("n_turns").alias("total_turns"),
        F.sum("bytes_parsed").alias("total_bytes"),
        F.round(
            F.sum("n_empty") / F.greatest(F.sum("n_turns"), F.lit(1)), 6
        ).alias("empty_rate"),
        F.round(F.expr("percentile_approx(turns_per_sec, 0.5)"), 1).alias(
            "p50_partition_tps"
        ),
        F.round(F.expr("percentile_approx(turns_per_sec, 0.95)"), 1).alias(
            "p95_partition_tps"
        ),
        F.round(
            F.max("n_turns")
            / F.greatest(F.expr("percentile_approx(n_turns, 0.5)"), F.lit(1)),
            2,
        ).alias("partition_skew_ratio"),
    )
