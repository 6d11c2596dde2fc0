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


def extract_json_payload(col: Column) -> Column:
    """Native column version of steps 1-2 (strip-think + fence
    extract); pair with ``F.from_json`` when the JSON shape is known.
    Returns the raw payload string ('' stays '' — json validity is the
    caller's schema concern)."""
    after_think = F.element_at(F.split(col, re.escape(_THINK_TAG)), -1)
    fenced = F.regexp_extract(after_think, r"```json\s*([\s\S]*?)\s*```", 1)
    return F.when(F.length(fenced) > 0, fenced).otherwise(F.trim(after_think))
