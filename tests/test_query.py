"""Query surface (Q1-Q5) over a materialized graph + span-overlap P/R
harness (FIXTURES.md F6 semantics)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from legal_knowledge_graph_spark.datagen import generate_pages
from legal_knowledge_graph_spark.operators.query import (
    get_corpus_toc,
    lookup_by_id,
    resolve_response,
    search_children,
    search_corpus,
    search_neighbors,
    span_overlap_pr,
)
from legal_knowledge_graph_spark.operators.summarize import embed_texts_np
from legal_knowledge_graph_spark.pipeline import run_pipeline

N = 30


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    wd = tmp_path_factory.mktemp("graph")
    pages = generate_pages(spark, N)
    out = run_pipeline(spark, pages, str(wd))
    return {"pages": pages, **out}


def test_q1_search_corpus(graph):
    rows = search_corpus(graph["nodes"]).collect()
    assert len(rows) == N
    names = [r["contract_name"] for r in rows]
    assert names == sorted(names)


def test_q2_toc(graph):
    cid = search_corpus(graph["nodes"]).first()["contract_id"]
    toc = get_corpus_toc(graph["nodes"], cid).collect()
    assert len(toc) == 1
    parsed = json.loads(toc[0]["toc_json"])
    assert all(k.startswith("ARTICLE_") for k in parsed)
    assert all(isinstance(v, list) and v for v in parsed.values())


def test_q3_topk_cosine_retrieval(graph):
    """Querying with a section's own text must retrieve that section
    first among its siblings (deterministic embeddings make this
    exact)."""
    nodes, edges = graph["nodes"], graph["edges"]
    # pick an article with >= 2 sections
    art = (
        nodes.where((F.col("label") == "Chunk") & F.col("name").startswith("ARTICLE"))
        .orderBy("url", "order")
        .first()
    )
    kids = (
        edges.where((F.col("type") == "CHILD") & (F.col("src_id") == art["node_id"]))
        .join(nodes, F.col("dst_id") == F.col("node_id"))
        .select("node_id", "summary", "content")
        .collect()
    )
    assert len(kids) >= 2
    target = kids[0]
    qtext = target["summary"] or target["content"]
    qvec = [float(x) for x in embed_texts_np([qtext])[0]]
    res = search_children(nodes, edges, art["node_id"], qvec, top_k=3).collect()
    assert res, "no results"
    assert res[0]["node_id"] == target["node_id"]
    assert res[0]["score"] == pytest.approx(1.0, abs=1e-5)
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)

    # Sub-variant quirk parity (reference search_chunk.py:108-118):
    # returns a `leaf` column that is ALWAYS null (the property is
    # never written by the reference's write path).
    sub = search_children(
        nodes, edges, art["node_id"], qvec, top_k=3, sub_variant=True
    ).collect()
    assert [r["node_id"] for r in sub] == [r["node_id"] for r in res]
    assert all(r["leaf"] is None for r in sub)


def test_q4_neighbors(graph):
    nodes, edges = graph["nodes"], graph["edges"]
    mid = (
        edges.where(F.col("type") == "NEXT")
        .groupBy("dst_id")
        .count()
        .join(
            edges.where(F.col("type") == "NEXT").select(F.col("src_id").alias("dst_id")),
            "dst_id",
        )
        .first()["dst_id"]
    )
    nb = search_neighbors(nodes, edges, mid).collect()
    assert len(nb) == 2  # middle sibling has both prev and next


def test_q5_resolve_and_bucket_pruning(graph):
    nodes, pages = graph["nodes"], graph["pages"]
    some = (
        nodes.where((F.col("label") == "Chunk") & F.col("name").startswith("section"))
        .limit(3)
        .collect()
    )
    ids = [r["node_id"] for r in some]
    res = {r["node_id"]: r for r in resolve_response(nodes, pages, ids).collect()}
    assert set(res) == set(ids)
    # recomputed spans must equal the materialized absolute spans
    # (planted content is unique within each page)
    for r in some:
        assert res[r["node_id"]]["span_start"] == r["span_start"]
        assert res[r["node_id"]]["span_end"] == r["span_end"]

    pruned = lookup_by_id(nodes, ids)
    assert pruned.count() == len(ids)
    # the plan carries a partition filter on bucket
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_span_overlap_pr(spark):
    retrieved = spark.createDataFrame(
        [(1, "u", 0, 10), (1, "u", 20, 30), (2, "u", 0, 4)],
        "query_id long, url string, span_start long, span_end long",
    )
    golden = spark.createDataFrame(
        [(1, "u", 5, 25), (2, "v", 0, 4)],
        "query_id long, url string, span_start long, span_end long",
    )
    pr = {r["query_id"]: r for r in span_overlap_pr(retrieved, golden).collect()}
    # q1: overlap = (5..10)+(20..25) = 10; retrieved len 20, golden len 20
    assert pr[1]["precision"] == pytest.approx(0.5)
    assert pr[1]["recall"] == pytest.approx(0.5)
    # q2: no overlapping url -> 0
    assert pr[2]["precision"] == 0.0
    assert pr[2]["recall"] == 0.0
