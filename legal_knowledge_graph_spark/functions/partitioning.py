"""Scan-parallelism guard shared by the CPU-heavy map operators.

A single-file parquet corpus scans as 1-2 input splits (128 MB
``spark.sql.files.maxPartitionBytes`` vs a ~6 MB file), so every
NARROW stage above it — Arrow extraction passes, Python regex/codec
work, explode-heavy gram fans — runs on 1-2 cores no matter how many
the session has. The guard round-robins such inputs up to the default
parallelism; on a well-partitioned cluster table it is a no-op and
never ADDS a shuffle (round-3 finding, generalized from
operators/dedup.py in round 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallel(df: DataFrame) -> DataFrame:
    """Repartition iff the input has fewer partitions than half the
    default parallelism; no-op otherwise.

    Under-parallelism only afflicts NARROW plans rooted at a few input
    splits: any Exchange between the scan and this operator already
    spreads the data across the (cores-scaled) shuffle partitions. The
    Exchange probe matters for cost too — ``df.rdd`` on an AQE plan
    triggers getFinalPhysicalPlan(), which EXECUTES every upstream
    query stage on the driver thread at plan-BUILD time and then
    re-executes it at action time (measured: ~5 s of serial build time
    in the 400k-page nodes stage before this check existed). On an
    exchange-free plan ``df.rdd`` is pure planning and stays cheap."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if target <= 1:
        return df
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        return df
    if df.rdd.getNumPartitions() < max(target // 2, 2):
        return df.repartition(target)
    return df
