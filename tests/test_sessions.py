"""Stateful streaming sessionization == batch gap-and-island oracle on
closed sessions."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from legal_knowledge_graph_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)

GAP = 3600.0  # 1 hour


def test_batch_sessionization_shape(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sessions = sessionize_batch(ev, GAP)
    rows = sessions.collect()
    assert rows
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
    # per-user event counts conserved
    total = sessions.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()


def test_stream_sessions_match_batch_closed(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where("user_id < 15")
    src = str(tmp_path / "ev_src")
    ev.repartition(2).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(src)
    q = (
        sessionize_stream(stream, GAP)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120) or q.stop()

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["value_sum_x100"])
        for r in spark.table("sessions_stream").collect()
    }

    batch = sessionize_batch(ev, GAP)
    # the stream can only have emitted CLOSED sessions (each user's
    # last session may still sit in state when availableNow drains)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("session_start"))
    closed = (
        batch.withColumn("rn", F.row_number().over(w))
        .where("rn > 1")
        .select("user_id", "session_start", "session_end", "n_events", "value_sum_x100")
    )
    want = {tuple(r) for r in closed.collect()}
    assert want  # the fixture really contains multi-session users
    assert want <= got  # every closed session was emitted correctly
    # nothing extra beyond batch sessions at all
    all_sessions = {
        tuple(r)
        for r in batch.select(
            "user_id", "session_start", "session_end", "n_events", "value_sum_x100"
        ).collect()
    }
    assert got <= all_sessions
