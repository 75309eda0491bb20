"""Incremental ingestion variant (SURVEY.md §2.9).

The reference is strictly request/response, and the batch job covers
the north rule; this module drops the SAME fused extraction stage into
Structured Streaming for incremental arrival of transcript files:
readStream over a directory of parquet transcript files →
foreachBatch(extract + idempotent sink append). Each turn is processed
independently, so no watermark/event-time window is semantically
required; exactly-once comes from the checkpointLocation + idempotent
per-(conv_id, turn_idx) sink.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from engine.spark.pipeline import run_extraction
from engine.spark.schemas import TRANSCRIPT_SCHEMA

if TYPE_CHECKING:
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming import StreamingQuery


def stream_extract(
    spark: "SparkSession",
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    num_partitions: int = 32,
    available_now: bool = True,
) -> "StreamingQuery":
    """Start (or run-to-drain with availableNow) the streaming job."""
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def sink(batch_df, batch_id: int) -> None:
        extracted = run_extraction(batch_df, num_partitions=num_partitions)
        (
            extracted.write.mode("append")
            .partitionBy("part_id")
            .parquet(f"{output_dir}/results")
        )

    writer = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
