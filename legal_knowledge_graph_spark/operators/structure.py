"""M4 — sequential per-document structure detection
(DocumentStructureDetector analogue).

The reference's unwired alternative chunker
(nodes/document_structure_detector.py:90-146) walks a document's pages
IN ORDER, carrying ``entries_identified_so_far`` between per-page LLM
calls, and aligns each detected entry with the same fuzzy kernel at an
absolute offset (``:117-135``). The Spark expression of "sequential
loop with carried state over an ordered group" is ``applyInPandas``
grouped by document: grouping guarantees co-location, the group
function sorts by page order and runs the stateful loop locally —
state never crosses an executor boundary, so this is legal and scales
by document count.

The detector here is deterministic (heading continuation: an entry is
'new' only if its key wasn't identified on an earlier page — the
carried-state contract of the reference prompt, :16-54); a sequential
LLM slots into ``_detect_page`` unchanged.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from legal_knowledge_graph_spark.operators.align import best_window_by_words

_HEADING_RE = re.compile(r"^(ARTICLE [IVXLC]+\.|Section \d+\.\d+ )", re.MULTILINE)

STRUCT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("entry_key", T.StringType(), False),
        T.StructField("page_idx", T.IntegerType(), False),
        T.StructField("abs_start", T.LongType(), False),
        T.StructField("abs_end", T.LongType(), False),
    ]
)


def _detect_page(page_text: str, seen: set[str]) -> list[str]:
    """The model slot: one page in, newly-identified entry keys out,
    given the keys identified so far (the carried state)."""
    out = []
    for m in _HEADING_RE.finditer(page_text):
        key = m.group(1).strip().rstrip(".")
        if key not in seen:
            seen.add(key)
            out.append(key)
    return out


def detect_structure_sequential(
    pages: DataFrame,
    url_col: str = "url",
    order_col: str = "page_idx",
    text_col: str = "page_text",
) -> DataFrame:
    """pages(url, page_idx, page_text) -> structure entries with
    ABSOLUTE character spans (offset = sum of earlier pages' lengths,
    matching the reference's absolute-span variant, :117-135). Entry
    span = best fuzzy window for the heading line within its page,
    shifted by the page offset."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        seen: set[str] = set()
        offset = 0
        rows = []
        for _, r in pdf.iterrows():
            text = r[text_col] or ""
            for key in _detect_page(text, seen):
                s, e, _score = best_window_by_words(text, key)
                rows.append((r[url_col], key, int(r[order_col]), offset + s, offset + e))
            offset += len(text)
        return pd.DataFrame(rows, columns=[f.name for f in STRUCT_SCHEMA.fields])

    return (
        pages.select(url_col, order_col, text_col)
        .groupBy(url_col)
        .applyInPandas(run, STRUCT_SCHEMA)
    )
