"""Stage 1 — text extraction (T1).

``pages -> extracted`` : adds intro/body/body_span via pure native
Catalyst expressions (functions/text.py). Byte-identical per-url
invariant vs reference semantics (intro_body_separator.py:28-46).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from legal_knowledge_graph_spark.functions.text import split_intro_body


def extract_text(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) ->
    + (intro, body, body_span_start, body_span_end).

    Narrow projection: pipelines with the scan, no shuffle, whole-stage
    codegen. html is dropped here — downstream stages only need text —
    so the columnar reader prunes the (large, binary) html column for
    every consumer that starts from this stage.
    """
    return split_intro_body(pages, "text").drop("html")
