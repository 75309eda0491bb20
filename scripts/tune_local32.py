#!/usr/bin/env python
"""One-off: measure extraction throughput at local[32] under a JVM/
Arrow tuning variant (fresh JVM per invocation; run via subprocess).

Usage: python scripts/tune_local32.py <variant>
Prints one JSON line {"variant":..., "turns":..., "wall_s":..., "tps":...}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # get_spark now bakes the GC cap into every session; 'base' must
    # explicitly clear it so base-vs-gc measures what the names claim
    "base": {"spark.driver.extraJavaOptions": ""},
    "gc": {
        "spark.driver.extraJavaOptions": "-XX:ParallelGCThreads=4 -XX:ConcGCThreads=2"
    },
    "batch8k": {
        "spark.driver.extraJavaOptions": "",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
    },
    "gc_batch8k": {
        "spark.driver.extraJavaOptions": "-XX:ParallelGCThreads=4 -XX:ConcGCThreads=2",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
    },
    "gc_codegen": {
        "spark.driver.extraJavaOptions": "-XX:ParallelGCThreads=4 -XX:ConcGCThreads=2 -XX:CICompilerCount=4"
    },
    # 2x instead of 4x partitions (partition multiple handled below)
    "parts2x": {"spark.driver.extraJavaOptions": ""},
    "gc_parts2x": {
        "spark.driver.extraJavaOptions": "-XX:ParallelGCThreads=4 -XX:ConcGCThreads=2"
    },
    "gc_parts1x": {
        "spark.driver.extraJavaOptions": "-XX:ParallelGCThreads=4 -XX:ConcGCThreads=2"
    },
}


def main() -> None:
    variant = sys.argv[1]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_convs = int(sys.argv[3]) if len(sys.argv) > 3 else 30000

    from bench import _materialize_inputs, _run_extraction
    from engine.spark.session import get_spark

    from pyspark.sql import functions as F
    from engine.spark.pipeline import run_extraction

    spark = get_spark(
        f"tune-{variant}", cpus=cpus, extra_conf=VARIANTS[variant]
    )
    path = _materialize_inputs(spark, "/root/testdata/sf0.1", n_convs)
    t = spark.read.parquet(path)
    mult = {"parts2x": 2, "gc_parts2x": 2, "gc_parts1x": 1}.get(variant, 4)
    num_partitions = cpus * mult
    # warm run: steady-state is the metric; compile/JIT paid here
    run_extraction(t, num_partitions=num_partitions).agg(F.count("*")).collect()
    t0 = time.time()
    res = run_extraction(t, num_partitions=num_partitions)
    agg = res.agg(
        F.count("*").alias("n"),
        F.sum(F.col("is_empty").cast("long")).alias("e"),
    ).collect()[0]
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "variant": variant,
                "cpus": cpus,
                "turns": int(agg.n),
                "wall_s": round(wall, 2),
                "tps": round(agg.n / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
