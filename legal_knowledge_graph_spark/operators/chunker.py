"""Stage 4 — hierarchical chunking: boundary proposal + fuzzy alignment
+ tree construction (M2 / F1 / F2 / A1 analogues).

Reference dataflow (nodes/chunker.py:139-196): an LLM proposes, per TOC
leaf, a verbatim ``{start_sentence, end_sentence}`` pair; a fuzzy
sliding-window matcher aligns each sentence back to the document text
(chunker.py:93-121); ``transform_tree`` then builds the Article→Section
chunk tree where internal nodes aggregate ``span = (min child start,
max child end)`` and ``content = "".join(child contents)``
(chunker.py:150-196).

Here the LLM proposal is a deterministic extractor behind the same
batched-inference interface (``mapInPandas``): it detects
ARTICLE/Section headings and emits boundary-sentence records with the
same shape an LLM would produce (verbatim sentences, >= 4 words — the
reference's prompt contract, chunker.py:27-38). The alignment kernel
(operators/align.py) then recovers character spans EXACTLY as the
reference does, so spans are earned via fuzzy alignment rather than
leaked from the proposal regex.

Scale notes:
- Proposal and alignment run in ONE ``mapInPandas`` pass over the
  extracted pages: no shuffle, no join — each document's body and its
  boundary proposals never leave the task that scanned them. At 10^12
  docs this stage is embarrassingly parallel and CPU-bound.
- Tree construction is a single ``groupBy(url, parent)`` aggregation
  (map-side combinable); article rows are derived from leaf rows, so
  there is exactly one shuffle keyed by url.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from legal_knowledge_graph_spark.operators.align import DocAligner

# Heading detectors for the deterministic proposer. A learned model
# slots into propose_and_align's inner function without changing the
# stage contract (batch of (url, body) in -> boundary/leaf records out).
_ARTICLE_RE = re.compile(r"^ARTICLE ([IVXLC]+)\.", re.MULTILINE)
_SECTION_RE = re.compile(r"^Section (\d+)\.(\d+) ", re.MULTILINE)
_TOKEN_RE = re.compile(r"\S+")

#: Boundary sentences are verbatim token runs; the reference's prompt
#: requires >= 4 words (chunker.py:27-38). 10 tokens makes start/end
#: sentences unique enough for the aligner while staying sentence-sized.
BOUNDARY_TOKENS = 10

LEAF_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("path_key", T.StringType(), False),
        T.StructField("parent_path", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("sibling_order", T.IntegerType(), False),
        T.StructField("span_start", T.LongType(), False),
        T.StructField("span_end", T.LongType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("start_sentence", T.StringType(), False),
        T.StructField("end_sentence", T.StringType(), False),
    ]
)


def _boundary_sentences(body: str, seg_start: int, seg_end: int) -> tuple[str, str]:
    """First/last BOUNDARY_TOKENS verbatim tokens of body[seg_start:seg_end]."""
    seg = body[seg_start:seg_end]
    toks = [(m.start(), m.end()) for m in _TOKEN_RE.finditer(seg)]
    if not toks:
        return "", ""
    head = toks[:BOUNDARY_TOKENS]
    tail = toks[-BOUNDARY_TOKENS:]
    start_sentence = seg[head[0][0] : head[-1][1]]
    end_sentence = seg[tail[0][0] : tail[-1][1]]
    return start_sentence, end_sentence


def propose_and_align(extracted: DataFrame) -> DataFrame:
    """extracted(url, body, ...) -> leaf chunk rows (Section level) with
    body-relative spans recovered by the fuzzy alignment kernel.

    One fused map stage: propose boundary sentences per section, then
    align each (start_sentence, end_sentence) back into the body with
    the reference-exact sliding-window matcher. Emitting the aligned
    span (not the regex span) keeps parity with the reference's
    LLM-propose -> fuzzy-align path, and the golden-chunk test verifies
    the aligner actually recovers the planted spans.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, body in zip(pdf["url"], pdf["body"]):
                arts = list(_ARTICLE_RE.finditer(body))
                if not arts:
                    continue
                secs = list(_SECTION_RE.finditer(body))
                # one tokenization/index per document, shared by every
                # section's two boundary alignments
                aligner = DocAligner(body)
                for ai, am in enumerate(arts):
                    art_key = f"ARTICLE_{am.group(1)}"
                    art_end = arts[ai + 1].start() if ai + 1 < len(arts) else len(body)
                    in_art = [m for m in secs if am.start() <= m.start() < art_end]
                    for si, sm in enumerate(in_art):
                        seg_start = sm.start()
                        seg_end = (
                            in_art[si + 1].start() if si + 1 < len(in_art) else art_end
                        )
                        start_sent, end_sent = _boundary_sentences(body, seg_start, seg_end)
                        if not start_sent:
                            continue
                        s, e = aligner.sentence_range(start_sent, end_sent)
                        rows.append(
                            (
                                url,
                                f"{art_key}/section_{sm.group(1)}_{sm.group(2)}",
                                art_key,
                                2,
                                si,
                                s,
                                e,
                                body[s:e],
                                start_sent,
                                end_sent,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in LEAF_SCHEMA.fields],
            )

    from legal_knowledge_graph_spark.functions.partitioning import ensure_parallel

    return ensure_parallel(extracted.select("url", "body")).mapInPandas(
        run, LEAF_SCHEMA
    )


def build_chunk_tree(leaves: DataFrame) -> DataFrame:
    """Leaf rows -> full chunks table (adjacency-list tree encoding).

    Internal (Article) rows follow the reference's ``transform_tree``
    aggregation exactly (chunker.py:172-174): span = (min child start,
    max child end); content = concatenation of child contents in
    sibling order. Leaf content was emitted by the fused
    propose+align map stage (``body[s:e]``), so this stage needs NO
    join back to the pages table — the only shuffle is the
    map-side-combinable groupBy(url, parent) for article rows.

    Output: (url, path_key, parent_path, depth, sibling_order,
    span_start, span_end, content, is_leaf). Spans are body-relative;
    materialization converts to absolute via body_span_start.
    """
    leaf_rows = leaves.select(
        "url",
        "path_key",
        "parent_path",
        "depth",
        "sibling_order",
        "span_start",
        "span_end",
        "content",
        F.lit(True).alias("is_leaf"),
    )

    # Article sibling_order = rank of the article within the url by
    # first child start (documents emit articles in order, so min
    # child span_start is the article's position).
    art_agg = leaf_rows.groupBy("url", "parent_path").agg(
        F.min("span_start").alias("span_start"),
        F.max("span_end").alias("span_end"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sibling_order", "content"))),
                lambda x: x["content"],
            ),
            "",
        ).alias("content"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("span_start")
    art_rows = art_agg.select(
        "url",
        F.col("parent_path").alias("path_key"),
        F.lit(None).cast("string").alias("parent_path"),
        F.lit(1).alias("depth"),
        (F.row_number().over(w) - 1).alias("sibling_order"),
        "span_start",
        "span_end",
        "content",
        F.lit(False).alias("is_leaf"),
    )
    return leaf_rows.unionByName(art_rows)


def chunk_documents(extracted: DataFrame) -> DataFrame:
    """Full chunking stage: propose+align -> tree."""
    return build_chunk_tree(propose_and_align(extracted))
