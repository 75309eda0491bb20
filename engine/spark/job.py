"""Checkpointed, resumable extraction job with per-partition lineage
and metrics (north rule: resume at partition granularity).

Layout under ``out_dir`` (plain-parquet sink; see engine.spark.iceberg
for the Iceberg MERGE variant used when a catalog is configured):

    results/part_id=K/*.parquet   — extraction output, one dir per
                                    deterministic partition (dynamic
                                    partition overwrite → idempotent)
    checkpoints/*.parquet         — append-only (run_id, part_id,
                                    status, n_turns, manifest columns);
                                    a partition is done iff a row exists
    metrics/*.parquet             — per-partition turns/sec, bytes
                                    parsed, empty-extraction rate
    manifests/part-K.json         — lineage manifest per partition

Resume protocol: the driver lists completed part_ids from the
checkpoint table and anti-joins them from the partition work list, so
a killed job redoes only unfinished partitions. part_id is a pure
function of (conv_id, turn_idx) — pipeline.part_expr — so work
assignment is stable across runs and cluster sizes.
"""

from __future__ import annotations

import json
import os
import time
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from engine.spark.pipeline import run_extraction, split_valid

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def _completed_parts(spark: "SparkSession", ckpt_dir: str, run_id: str) -> set[int]:
    if not os.path.isdir(ckpt_dir) or not os.listdir(ckpt_dir):
        return set()
    df = spark.read.parquet(ckpt_dir)
    rows = (
        df.filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
        .select("part_id")
        .distinct()
        .collect()
    )
    return {r.part_id for r in rows}


def run_checkpointed(
    spark: "SparkSession",
    transcripts: "DataFrame",
    out_dir: str,
    run_id: str = "run-1",
    num_partitions: int | None = None,
    partition_batches: int = 4,
    fail_after_batches: int | None = None,
) -> "DataFrame":
    """Run extraction over ``transcripts``, committing results +
    checkpoint rows in ``partition_batches`` independent slices of the
    partition space (each slice = one atomic unit of restart).

    ``fail_after_batches`` injects a crash for the resume test.
    Returns the results DataFrame read back from the sink.
    """
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    results_dir = f"{out_dir}/results"
    ckpt_dir = f"{out_dir}/checkpoints"
    metrics_dir = f"{out_dir}/metrics"
    manifest_dir = f"{out_dir}/manifests"
    os.makedirs(manifest_dir, exist_ok=True)

    # slice commits rely on dynamic partition overwrite (idempotent
    # re-commit of ONLY the touched part_id dirs); static mode would
    # wipe previously committed slices — set it here, not in session
    # factory, so spark-submit sessions are safe too
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    done = _completed_parts(spark, ckpt_dir, run_id)
    todo = [p for p in range(num_partitions) if p not in done]
    if not todo:
        return spark.read.parquet(results_dir)

    # P2: route malformed rows to the errors table instead of dropping
    transcripts, errors = split_valid(transcripts)
    errors.write.mode("overwrite").parquet(f"{out_dir}/errors")

    extracted = run_extraction(transcripts, num_partitions=num_partitions).persist()
    try:
        slice_size = max(1, (num_partitions + partition_batches - 1) // partition_batches)
        batches_done = 0
        for lo in range(0, num_partitions, slice_size):
            batch = [p for p in range(lo, min(lo + slice_size, num_partitions)) if p in todo]
            if not batch:
                continue
            if fail_after_batches is not None and batches_done >= fail_after_batches:
                raise RuntimeError("injected failure for resume test")
            t0 = time.time()
            part = extracted.filter(F.col("part_id").isin(batch))
            # dynamic partition overwrite → idempotent re-commit of a slice
            part.write.mode("overwrite").partitionBy("part_id").parquet(results_dir)
            wall_s = time.time() - t0

            stats = (
                part.groupBy("part_id")
                .agg(
                    F.count("*").alias("n_turns"),
                    F.sum("bytes_in").alias("bytes_parsed"),
                    F.sum(F.col("is_empty").cast("long")).alias("n_empty"),
                    F.sum("proc_us").alias("proc_us"),
                )
                .collect()
            )
            metrics_rows = []
            ckpt_rows = []
            for r in stats:
                turns_per_sec = r.n_turns / max(r.proc_us / 1e6, 1e-9)
                metrics_rows.append(
                    (
                        run_id, int(r.part_id), int(r.n_turns), int(r.bytes_parsed),
                        int(r.n_empty), float(r.n_empty) / max(r.n_turns, 1),
                        float(turns_per_sec), float(wall_s),
                    )
                )
                ckpt_rows.append((run_id, int(r.part_id), "done", int(r.n_turns)))
                manifest = {
                    "run_id": run_id,
                    "part_id": int(r.part_id),
                    "n_turns": int(r.n_turns),
                    "bytes_parsed": int(r.bytes_parsed),
                    "n_empty": int(r.n_empty),
                    "sink": f"{results_dir}/part_id={int(r.part_id)}",
                }
                with open(f"{manifest_dir}/part-{int(r.part_id)}.json", "w") as fh:
                    json.dump(manifest, fh, sort_keys=True)
            # empty partitions still need a checkpoint row
            seen = {r.part_id for r in stats}
            ckpt_rows += [(run_id, p, "done", 0) for p in batch if p not in seen]

            spark.createDataFrame(
                metrics_rows,
                "run_id string, part_id int, n_turns long, bytes_parsed long, "
                "n_empty long, empty_rate double, turns_per_sec double, wall_s double",
            ).write.mode("append").parquet(metrics_dir)
            # checkpoint commit LAST: a crash before this line redoes the
            # slice (idempotent overwrite), never skips it
            spark.createDataFrame(
                ckpt_rows, "run_id string, part_id int, status string, n_turns long"
            ).write.mode("append").parquet(ckpt_dir)
            batches_done += 1
    finally:
        extracted.unpersist()
    return spark.read.parquet(results_dir)
