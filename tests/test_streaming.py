"""Structured-Streaming: incremental KG construction equals the batch
result on the same closed input; watermarked windowed agg equals the
batch aggregation; replay dedup via deterministic identity."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from legal_knowledge_graph_spark.datagen import generate_pages
from legal_knowledge_graph_spark.streaming.incremental import (
    read_stream_triples,
    stream_event_windows,
    stream_pages_to_graph,
)

N = 60


def test_stream_matches_batch_triples(spark, tmp_path):
    src = str(tmp_path / "pages_src")
    wd = str(tmp_path / "stream_wd")
    # write source as several files so multiple micro-batches fire
    generate_pages(spark, N).repartition(6).write.mode("overwrite").parquet(src)

    q = stream_pages_to_graph(spark, src, wd)
    q.awaitTermination(300)
    streamed = read_stream_triples(spark, wd)

    # batch reference over the same input
    from legal_knowledge_graph_spark.operators.extract import extract_text
    from legal_knowledge_graph_spark.operators.linking import link_entities
    from legal_knowledge_graph_spark.operators.triples import (
        canonicalize_triples,
        detect_mentions,
        extract_triples,
    )

    pages = spark.read.parquet(src)
    extracted = extract_text(pages)
    batch = canonicalize_triples(
        extract_triples(extracted), link_entities(detect_mentions(extracted))
    )

    got = {tuple(r) for r in streamed.select("url", "subj", "pred", "obj").collect()}
    want = {tuple(r) for r in batch.select("url", "subj", "pred", "obj").collect()}
    # micro-batch linking sees only its batch's surfaces; canonical ids
    # may differ across batches for fuzzy clusters, but the planted
    # alias scheme normalizes exactly, so sets must match here
    assert got == want
    assert len(got) > 0

    # replay: run the stream again with a FRESH checkpoint (simulating
    # at-least-once redelivery); dedup by deterministic identity holds
    q2 = stream_pages_to_graph(spark, src, wd, checkpoint_dir=str(tmp_path / "ck2"))
    q2.awaitTermination(300)
    assert read_stream_triples(spark, wd).count() == len(
        {tuple(r) for r in streamed.select("url", "span_start", "span_end").collect()}
    )
    # raw appended files really did double (dedup is doing work)
    raw = spark.read.parquet(f"{wd}/triples_stream").count()
    assert raw >= 2 * len(got)
    shutil.rmtree(wd, ignore_errors=True)


def test_stream_event_windows_equals_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_src")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    q, name = stream_event_windows(spark, src, str(tmp_path / "ck"))
    q.awaitTermination(300)
    got = {
        tuple(r)
        for r in spark.table(name)
        .select("window_start", "event_type", "n_events", "value_sum_x100")
        .collect()
    }
    want = {
        tuple(r)
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("value") * 100).cast("long")).alias("value_sum_x100"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum_x100",
        )
        .collect()
    }
    assert got == want
    assert len(got) > 100
