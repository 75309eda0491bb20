"""Distribution layer: Spark schemas, the fused extraction stage,
partitioning/skew/ordering, checkpointed sink, and analytics operators."""
