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


def test_toc_to_components_reference_quirks():
    """Branch-by-branch goldens vs the reference reshape
    (tools/get_corpus_toc.py:37-101)."""
    from legal_knowledge_graph_spark.functions.parse import (
        reshape_toc_json,
        toc_to_components,
    )

    # pass-through: list of dicts ALL carrying component_name
    done = [{"component_name": "X", "component_description": None, "childs": []}]
    assert toc_to_components(done) is done
    # non-dict toc (incl. a list WITHOUT the marker) -> []
    assert toc_to_components("str") == []
    assert toc_to_components(3) == []
    assert toc_to_components([{"no_marker": 1}]) == []
    # article branch: dict value -> name + sections; non-str section
    # descriptions become None
    assert toc_to_components(
        {"Article_1": {"name": "First", "sections": {"s1": "d1", "s2": {"x": 1}}}}
    ) == [
        {
            "component_name": "Article_1",
            "component_description": "First",
            "childs": [
                {"component_name": "s1", "component_description": "d1", "childs": []},
                {"component_name": "s2", "component_description": None, "childs": []},
            ],
        }
    ]
    # article: non-dict sections coerced to {}
    assert toc_to_components({"ARTICLE_2": {"sections": "bogus"}}) == [
        {"component_name": "ARTICLE_2", "component_description": None, "childs": []}
    ]
    # article: str value -> no name, no sections
    assert toc_to_components({"article_3": "juststr"}) == [
        {"component_name": "article_3", "component_description": None, "childs": []}
    ]
    # non-article dict: name extracted, non-name keys become children
    # (str -> itself, dict -> .get("name"), other -> None)
    assert toc_to_components(
        {"Exhibits": {"name": "Ex", "a": "da", "b": {"name": "db"}, "c": 5}}
    ) == [
        {
            "component_name": "Exhibits",
            "component_description": "Ex",
            "childs": [
                {"component_name": "a", "component_description": "da", "childs": []},
                {"component_name": "b", "component_description": "db", "childs": []},
                {"component_name": "c", "component_description": None, "childs": []},
            ],
        }
    ]
    # non-article str value -> it IS the description
    assert toc_to_components({"Annex_A": "descA"}) == [
        {"component_name": "Annex_A", "component_description": "descA", "childs": []}
    ]
    # non-str top key: stringified only for the article check, kept
    # verbatim as component_name (reference :46)
    assert toc_to_components({1: "x"}) == [
        {"component_name": 1, "component_description": "x", "childs": []}
    ]
    # unparseable stored string stays a raw str -> reshapes to []
    # (get_corpus_toc.py:112-117)
    assert reshape_toc_json("not json {") == "[]"
