"""Bucketed co-located joins (100 TB join strategy).

At cluster scale the orders⋈lineitem family of joins shuffles both
fact tables on every run. Bucketing pays that shuffle once at write
time: both tables are bucketed (and sort-ordered) on the join key, so
every later join/aggregation on that key is exchange-free — Spark
reads bucket i of each side into the same task. This module provides
the one-time bucketize step and join/agg operators whose physical
plans contain NO Exchange (asserted in tests, not assumed).

Bucket-count sizing at scale: buckets ≈ total_bytes / target_task_mb,
rounded to a power of two shared by all co-bucketed tables; here 8 is
plenty for the sf test tables.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

DB = "graft_buckets"


def bucketize_orders_lineitem(
    spark: "SparkSession", sf_dir: str, location: str, n_buckets: int = 8
) -> None:
    """One-time write: orders and lineitem bucketed + sorted on the
    order key into a managed database at ``location``. Idempotent
    (overwrites)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB} LOCATION '{location}'")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .format("parquet")
        .saveAsTable(f"{DB}.orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .format("parquet")
        .saveAsTable(f"{DB}.lineitem_b")
    )


def order_consistency_bucketed(spark: "SparkSession") -> "DataFrame":
    """A2 order-consistency over the bucketed tables: the per-order
    line-revenue aggregation AND the orders join both run on the
    bucket key, so the whole plan is exchange-free (bucket i of
    lineitem aggregates locally and joins bucket i of orders in the
    same task)."""
    li = spark.table(f"{DB}.lineitem_b")
    orders = spark.table(f"{DB}.orders_b")
    line_sums = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            2,
        ).alias("line_revenue")
    )
    # merge hint: at test scale AQE would broadcast the (tiny) orders
    # side, hiding the property under test; at 100 TB neither fact
    # side broadcasts and the sort-merge join is what actually runs —
    # the hint makes the toy plan match the at-scale plan
    j = orders.hint("merge").join(
        line_sums, orders.o_orderkey == line_sums.l_orderkey
    )
    return j.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "line_revenue",
        (F.abs(F.col("o_totalprice") - F.col("line_revenue")) > 0.02).alias("mismatch"),
    )
