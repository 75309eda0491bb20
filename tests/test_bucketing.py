"""Bucketed co-located joins: the plan must be exchange-free and the
results identical to the shuffling implementation."""

import pytest
from pyspark.sql import functions as F

from engine.spark.bucketing import (
    bucketize_orders_lineitem,
    order_consistency_bucketed,
)
from engine.spark.relational import order_consistency

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("warehouse"))
    bucketize_orders_lineitem(spark, SF_DIR, loc, n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS graft_buckets.orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_buckets.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS graft_buckets")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    df = order_consistency_bucketed(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_results_match_shuffling_plan(spark, bucketed):
    a = sorted(tuple(r) for r in order_consistency_bucketed(spark).collect())
    b = sorted(tuple(r) for r in order_consistency(spark, SF_DIR).collect())
    assert a == b and len(a) > 0
