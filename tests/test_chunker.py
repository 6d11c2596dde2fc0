"""Chunk tree vs golden spans (FIXTURES.md F5).

The spans must be EARNED by the fuzzy alignment kernel (the
reference's propose->align path, chunker.py:93-121 + 150-196), not
copied from the heading regex — so exact golden-span equality here
proves the aligner recovers planted boundaries including through the
repeated-filler tie-breaking cases.
"""

from __future__ import annotations

from legal_knowledge_graph_spark.datagen import (
    generate_golden_chunks,
    generate_pages,
)
from legal_knowledge_graph_spark.operators.chunker import chunk_documents
from legal_knowledge_graph_spark.operators.extract import extract_text

N = 80


def test_chunk_tree_matches_golden(spark):
    extracted = extract_text(generate_pages(spark, N))
    got = {
        (r["url"], r["path_key"]): r
        for r in chunk_documents(extracted).collect()
    }
    golden = {
        (r["url"], r["path_key"]): r
        for r in generate_golden_chunks(spark, N).collect()
    }
    assert set(got) == set(golden)
    for key, g in golden.items():
        r = got[key]
        assert (r["span_start"], r["span_end"]) == (g["span_start"], g["span_end"]), key
        assert r["parent_path"] == g["parent_path"], key
        assert r["depth"] == g["depth"], key
        assert r["sibling_order"] == g["sibling_order"], key


def test_internal_node_aggregation(spark):
    """Article content == concat of section contents in sibling order;
    article span == (min child start, max child end) — reference
    transform_tree semantics (chunker.py:172-174)."""
    extracted = extract_text(generate_pages(spark, 12))
    chunks = chunk_documents(extracted).collect()
    by_parent: dict = {}
    for r in chunks:
        if r["is_leaf"]:
            by_parent.setdefault((r["url"], r["parent_path"]), []).append(r)
    arts = {(r["url"], r["path_key"]): r for r in chunks if not r["is_leaf"]}
    assert arts
    for (url, parent), kids in by_parent.items():
        kids.sort(key=lambda r: r["sibling_order"])
        a = arts[(url, parent)]
        assert a["span_start"] == min(k["span_start"] for k in kids)
        assert a["span_end"] == max(k["span_end"] for k in kids)
        assert a["content"] == "".join(k["content"] for k in kids)
