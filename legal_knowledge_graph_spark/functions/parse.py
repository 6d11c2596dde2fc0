"""Model-output parsing (T2) — reference utils/parser.py:9-26.

The reference's ``JsonOutputParser``:
1. if ``</think>`` occurs, keep only the text after its LAST occurrence
   (reasoning-trace stripping);
2. extract the first ```` ```json ... ``` ```` fenced block via regex
   (DOTALL), else use the whole remaining text;
3. ``json.loads`` it; ANY failure -> ``{}``.

Used inside the batched inference UDFs (the model slot's output side).
Exposed both as a pure-Python function (for UDF bodies) and as a
native column expression (regexp_replace/regexp_extract) for the parts
SQL can express — fence extraction and think-stripping are pure string
ops, so they stay JVM-side when the payload is already a column.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_FENCE_RE = re.compile(r"```json\s*(.*?)\s*```", re.DOTALL)
_THINK_TAG = "</think>"


def parse_model_json(text: str) -> dict:
    """Reference-exact semantics (utils/parser.py:9-26): {} on any
    parse failure, never raises."""
    if text is None:
        return {}
    idx = text.rfind(_THINK_TAG)
    if idx != -1:
        text = text[idx + len(_THINK_TAG) :]
    m = _FENCE_RE.search(text)
    payload = m.group(1) if m else text
    try:
        out = json.loads(payload)
    except (json.JSONDecodeError, TypeError):
        return {}
    return out if isinstance(out, dict) else {}


def toc_to_components(toc) -> list:
    """T3 — the reference's TOC→components reshape, quirk for quirk
    (tools/get_corpus_toc.py:37-101):

    - already-converted pass-through: a list of dicts that ALL carry
      "component_name" is returned unchanged (:38-40);
    - non-dict toc -> [] (:42-44);
    - keys whose lowercase starts with "article_" take the article
      branch (:48): description = top_val.get("name") only when the
      value is a dict (:50-53), children come from a "sections" dict
      (non-dict sections coerced to {}, :54-56), each section's
      description = its value if a str else None (:59-64);
    - any other key: dict value -> description = .get("name") and every
      non-"name" entry becomes a child whose description is the str
      value, a dict's .get("name"), or None (:71-88); str value -> it
      IS the description, no children (:89-90); any other type ->
      (None, []) (:70-71 defaults).

    Insertion order is preserved throughout (dict order == JSON
    document order), matching the reference's dict iteration.
    """
    if isinstance(toc, list) and all(
        isinstance(x, dict) and "component_name" in x for x in toc
    ):
        return toc

    components: list = []
    if not isinstance(toc, dict):
        return components

    for top_key, top_val in toc.items():
        key_str = top_key if isinstance(top_key, str) else str(top_key)
        if key_str.lower().startswith("article_"):
            name = None
            sections: dict = {}
            if isinstance(top_val, dict):
                name = top_val.get("name")
                sections = top_val.get("sections", {})
                if not isinstance(sections, dict):
                    sections = {}
            childs = [
                {
                    "component_name": sec_key,
                    "component_description": sec_val if isinstance(sec_val, str) else None,
                    "childs": [],
                }
                for sec_key, sec_val in sections.items()
            ]
            components.append(
                {
                    "component_name": top_key,
                    "component_description": name,
                    "childs": childs,
                }
            )
        else:
            comp_desc = None
            childs = []
            if isinstance(top_val, dict):
                comp_desc = top_val.get("name")
                for child_key, child_val in top_val.items():
                    if child_key == "name":
                        continue
                    if isinstance(child_val, str):
                        child_desc = child_val
                    elif isinstance(child_val, dict):
                        child_desc = child_val.get("name")
                    else:
                        child_desc = None
                    childs.append(
                        {
                            "component_name": child_key,
                            "component_description": child_desc,
                            "childs": [],
                        }
                    )
            elif isinstance(top_val, str):
                comp_desc = top_val
            components.append(
                {
                    "component_name": top_key,
                    "component_description": comp_desc,
                    "childs": childs,
                }
            )
    return components


def reshape_toc_json(toc_raw: str) -> str:
    """The Q2 read-side composition (get_corpus_toc.py:112-121): parse
    the stored TOC string if it parses, keep the raw value otherwise
    (the reference keeps the unparseable string, which then reshapes to
    [] because it is not a dict), reshape, re-serialize compactly."""
    toc_parsed = toc_raw
    if isinstance(toc_raw, str):
        try:
            toc_parsed = json.loads(toc_raw)
        except Exception:
            toc_parsed = toc_raw
    return json.dumps(toc_to_components(toc_parsed), separators=(",", ":"))


def extract_json_payload(col: Column) -> Column:
    """Native column version of steps 1-2 (strip-think + fence
    extract); pair with ``F.from_json`` when the JSON shape is known.
    Returns the raw payload string ('' stays '' — json validity is the
    caller's schema concern)."""
    after_think = F.element_at(F.split(col, re.escape(_THINK_TAG)), -1)
    fenced = F.regexp_extract(after_think, r"```json\s*([\s\S]*?)\s*```", 1)
    return F.when(F.length(fenced) > 0, fenced).otherwise(F.trim(after_think))
