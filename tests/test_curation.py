"""Curation operators: near-dup grouping, per-group sampling, sequence
packing, deterministic splits."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from legal_knowledge_graph_spark.operators.curation import (
    hash_split,
    near_duplicate_groups,
    pack_sequences,
    sample_per_group,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_near_duplicate_groups_clusters_planted_dup(spark, docs):
    base = docs.where("doc_id = 0").first()["text"]
    mutated = base.replace(base.split()[0], "zzz", 1)
    extra = spark.createDataFrame([(100000, mutated)], "doc_id long, text string")
    d = docs.select("doc_id", "text").where("doc_id < 50").unionByName(extra)
    groups = near_duplicate_groups(d, "doc_id", "text", threshold=0.7)
    rows = {r["doc_id"]: r for r in groups.collect()}
    assert len(rows) == 51  # every doc assigned, singletons included
    # the planted pair shares a group whose canonical is the min id
    assert rows[100000]["group_id"] == rows[0]["group_id"] == 0
    assert rows[0]["is_canonical"] and not rows[100000]["is_canonical"]
    # exactly one canonical per group
    per_group = groups.groupBy("group_id").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon")
    )
    assert per_group.where("n_canon <> 1").count() == 0


def test_near_duplicate_groups_reuses_supplied_pairs(spark, docs, monkeypatch):
    """Passing a precomputed pair table must skip the MinHash tier
    entirely (the round-2 double-compute finding): the internal
    minhash_near_duplicates call is poisoned, so any fallback would
    raise, and the groups must reflect exactly the supplied pairs."""
    from legal_knowledge_graph_spark.operators import dedup as dedup_mod

    def _boom(*a, **k):  # pragma: no cover - would fail the test
        raise AssertionError("minhash tier executed despite supplied pairs")

    monkeypatch.setattr(dedup_mod, "minhash_near_duplicates", _boom)
    d = docs.select("doc_id", "text").where("doc_id < 10")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 7), (1, 5)], "doc_a long, doc_b long"
    )
    groups = near_duplicate_groups(d, "doc_id", "text", pairs=pairs)
    rows = {r["doc_id"]: r for r in groups.collect()}
    assert len(rows) == 10
    assert rows[0]["group_id"] == rows[3]["group_id"] == rows[7]["group_id"] == 0
    assert rows[1]["group_id"] == rows[5]["group_id"] == 1
    assert rows[2]["group_id"] == 2 and rows[2]["is_canonical"]


def test_sample_per_group_caps_and_is_deterministic(spark, docs):
    d = docs.select("doc_id", "source")
    s1 = sample_per_group(d, "source", "doc_id", 3)
    counts = {r["source"]: r["n"] for r in s1.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts and all(v <= 3 for v in counts.values())
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in sample_per_group(d, "source", "doc_id", 3).collect())
    assert ids1 == ids2


def test_pack_sequences_hand_computed(spark):
    rows = [("s", i, t) for i, t in enumerate([40, 40, 40, 100, 10])]
    df = spark.createDataFrame(rows, "stream string, ord int, tok long")
    out = {
        r["ord"]: (r["bin_id"], r["bin_offset"])
        for r in pack_sequences(df, "stream", "ord", "tok", "ord", 100).collect()
    }
    # cumulative-before: 0, 40, 80, 120, 220 with budget 100
    assert out == {0: (0, 0), 1: (0, 40), 2: (0, 80), 3: (1, 20), 4: (2, 20)}


def test_hash_split_ratios_and_validation(spark, docs):
    d = docs.select("doc_id")
    out = hash_split(d, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert 0.7 <= counts["train"] / n <= 0.9  # 500 docs, loose band
    # deterministic: same assignment on re-run
    again = hash_split(d, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    assert (
        out.withColumnRenamed("split", "s1")
        .join(again.withColumnRenamed("split", "s2"), "doc_id")
        .where("s1 <> s2")
        .count()
        == 0
    )
    with pytest.raises(ValueError):
        hash_split(d, "doc_id", [("a", 0.5), ("b", 0.2)])


def test_near_duplicate_groups_rejects_knobs_with_pairs(spark, docs):
    """pairs= plus ANY explicit threshold/minhash knob raises — even the
    value that happens to equal the default (None-sentinel guard)."""
    d = docs.select("doc_id", "text").where("doc_id < 5")
    pairs = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    with pytest.raises(ValueError):
        near_duplicate_groups(d, "doc_id", "text", threshold=0.8, pairs=pairs)
    with pytest.raises(ValueError):
        near_duplicate_groups(d, "doc_id", "text", pairs=pairs, n_perm=128)
    # no knobs with pairs= is the supported fast path
    assert near_duplicate_groups(d, "doc_id", "text", pairs=pairs).count() == 5
