"""T2 parser semantics (utils/parser.py:9-26 parity) and M4 sequential
structure detection (document_structure_detector.py:90-146 analogue)."""

from __future__ import annotations

from legal_knowledge_graph_spark.functions.parse import parse_model_json
from legal_knowledge_graph_spark.operators.structure import detect_structure_sequential


def test_parse_model_json_reference_semantics():
    # fenced json after think trace
    assert parse_model_json('<think>a</think>```json {"k": 1}```') == {"k": 1}
    # LAST </think> wins
    assert parse_model_json('</think>{"a":1}</think>{"b":2}') == {"b": 2}
    # bare json, no fence
    assert parse_model_json('{"x": [1, 2]}') == {"x": [1, 2]}
    # failure modes -> {}
    assert parse_model_json("not json at all") == {}
    assert parse_model_json("```json {broken```") == {}
    assert parse_model_json(None) == {}
    assert parse_model_json("") == {}
    # non-dict json -> {} (reference parser feeds dict consumers)
    assert parse_model_json("[1,2,3]") == {}
    # multiline fence (DOTALL)
    assert parse_model_json('```json\n{\n "k": "v"\n}\n```') == {"k": "v"}


def test_detect_structure_sequential(spark):
    # 2 docs x 3 pages; ARTICLE I repeats on page 1 of doc a (carried
    # state must suppress the re-detection)
    rows = [
        ("a", 0, "ARTICLE I. intro text here\nSection 1.1 alpha beta gamma\n"),
        ("a", 1, "ARTICLE I. repeated heading\nSection 1.2 more words here\n"),
        ("a", 2, "ARTICLE II. closing text\n"),
        ("b", 0, "Section 9.9 only section no article\n"),
        ("b", 1, "plain page without headings\n"),
    ]
    pages = spark.createDataFrame(rows, "url string, page_idx int, page_text string")
    got = detect_structure_sequential(pages).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["url"], []).append(r)

    a_keys = {r["entry_key"]: r for r in by_doc["a"]}
    assert set(a_keys) == {"ARTICLE I", "Section 1.1", "Section 1.2", "ARTICLE II"}
    # carried state: ARTICLE I detected on page 0 only
    assert a_keys["ARTICLE I"]["page_idx"] == 0
    # absolute offsets: Section 1.2 lives on page 1 -> offset >= len(page0)
    p0_len = len(rows[0][2])
    assert a_keys["Section 1.2"]["abs_start"] >= p0_len
    # ARTICLE II on page 2
    assert a_keys["ARTICLE II"]["page_idx"] == 2
    assert a_keys["ARTICLE II"]["abs_start"] >= p0_len + len(rows[1][2])

    b_keys = {r["entry_key"] for r in by_doc["b"]}
    assert b_keys == {"Section 9.9"}
