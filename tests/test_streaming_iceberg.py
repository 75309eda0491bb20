"""Streaming-ingestion drain test + Iceberg gate behavior."""

import pytest
from pyspark.sql import functions as F

from engine.spark.iceberg import iceberg_available
from engine.spark.streaming import stream_extract
from engine.spark.transcripts import synthesize_transcripts


def test_stream_extract_drains_and_matches_batch(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    in_dir = str(base / "in")
    out_dir = str(base / "out")
    ckpt = str(base / "ckpt")

    t = synthesize_transcripts(spark, 8, 3, parallelism=2)
    t.write.mode("overwrite").parquet(in_dir)
    n_in = spark.read.parquet(in_dir).count()

    q = stream_extract(spark, in_dir, out_dir, ckpt, num_partitions=8)
    q.awaitTermination(300)

    res = spark.read.parquet(f"{out_dir}/results")
    assert res.count() == n_in
    assert res.filter(F.col("cleaned_text").isNull()).count() == 0

    # drained stream restarted with no new files → no duplicate rows
    q2 = stream_extract(spark, in_dir, out_dir, ckpt, num_partitions=8)
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out_dir}/results").count() == n_in


def test_iceberg_gate_reports_unavailable_in_sandbox(spark):
    # no iceberg runtime jar in this container: the gate must say so
    # (rather than exploding later inside DDL)
    assert iceberg_available(spark) is False
