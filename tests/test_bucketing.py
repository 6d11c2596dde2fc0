"""Bucketed co-located joins — the 100 TB layout claim exercised for
real, not just asserted in prose: writing both sides of a recurring
equi-join bucketed on the join key lets Spark plan a SortMergeJoin
with NO Exchange on either side (each bucket pair joins locally). This
is the parquet-native analogue of the reference store's hidden
``bucket(N, id)`` partitioning (reference query.py:40-57 context), and
the layout the materialized node/edge tables use at cluster scale."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    left = spark.range(0, 10_000).select(
        F.col("id").alias("node_id"), (F.col("id") % 97).alias("payload")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("node_id"), (F.col("id") % 31).alias("degree")
    )
    for name, df in (("t_nodes_b", left), ("t_degrees_b", right)):
        spark.sql(f"drop table if exists {name}")
        (
            df.write.mode("overwrite")
            .option("path", str(base / name))
            .bucketBy(8, "node_id")
            .sortBy("node_id")
            .saveAsTable(name)
        )
    yield "t_nodes_b", "t_degrees_b"
    for name in ("t_nodes_b", "t_degrees_b"):
        spark.sql(f"drop table if exists {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ln, rn = bucketed_tables
    # disable broadcast so the join genuinely exercises the bucketed
    # SortMergeJoin path (broadcast would hide the layout win)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(ln).join(spark.table(rn), "node_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_does_exchange(spark, bucketed_tables):
    """Control: the identical join over plain (unbucketed) data DOES
    shuffle both sides — the bucketed layout, not the optimizer mood,
    is what removed the Exchange above."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(0, 10_000).select(F.col("id").alias("node_id"))
        right = spark.range(0, 10_000).select(
            F.col("id").alias("node_id"), (F.col("id") % 31).alias("degree")
        )
        plan = (
            left.join(right, "node_id")._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
