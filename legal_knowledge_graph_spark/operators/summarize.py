"""Stage 5 — bottom-up hierarchical summarization + embeddings
(A2/A3/A4 + W6 analogues).

Reference semantics (nodes/summarizer.py:104-157): (1) summarize all
leaves (batched LLM); (2) for each depth from max down to the root,
each parent's input is ``"\\n\\n".join(child.summary or child.content)``
over its children in order; (3) the document (Corpus) summary comes
from the top-level children. The per-level barrier is inherent — a
parent needs its children's summaries — and the reference pays it too
(level-by-level ``chain.batch``, summarizer.py:124).

Here the LLM is a deterministic extractive summarizer behind the same
batched interface (``mapInPandas``; an Arrow batch of texts in, a
batch of summaries out). A real model slots into ``_summarize_series``
without touching the DAG.

Embeddings (W6, reference utils/database.py:32-38 + 198-208): a
deterministic feature-hashed bag-of-tokens vector, L2-normalized —
cosine similarity between these vectors behaves like a real text
embedding (shared tokens => higher similarity), so the query surface's
top-k cosine retrieval is meaningfully testable. Batched in numpy per
Arrow batch; dimension configurable (reference uses 3072; tests 64).

Scale notes:
- the level loop is bounded by tree depth (~3), each iteration is one
  map-side-combinable groupBy(parent) + one map stage;
- each level's frontier is tiny relative to pages (articles per doc),
  so the barrier costs little wall-clock;
- embedding is a pure map stage — no shuffle, pipelines with whatever
  produced its input.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_TOKEN_RE = re.compile(r"\S+")

#: reference prompt asks for a 2-3 sentence summary (summarizer.py:13-21)
SUMMARY_SENTENCES = 2
DEFAULT_EMBED_DIM = 64


def summarize_text(text: str) -> str:
    """Deterministic extractive stand-in for the reference's M3 LLM
    summarizer: the first SUMMARY_SENTENCES sentences, whitespace-
    normalized."""
    if not text:
        return ""
    sents = _SENT_SPLIT.split(text.strip())
    return " ".join(s.strip() for s in sents[:SUMMARY_SENTENCES] if s.strip())


def _summarize_series(texts: pd.Series) -> pd.Series:
    # the model slot: batch of texts in -> batch of summaries out
    return texts.map(summarize_text)


def _summ_stage(df: DataFrame, in_col: str, keep: list[str]) -> DataFrame:
    """Batched summarization map stage over ``in_col`` -> ``summary``."""
    schema = T.StructType(
        [df.schema[k] for k in keep] + [T.StructField("summary", T.StringType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            out["summary"] = _summarize_series(pdf[in_col])
            yield out

    return df.select(*dict.fromkeys(keep + [in_col])).mapInPandas(run, schema)


def summarize_tree(chunks: DataFrame) -> DataFrame:
    """chunks(..., depth, is_leaf, content) -> + summary column.

    Level-by-level bottom-up, exactly the reference's schedule
    (summarizer.py:124 sorts depths descending). Depths are discovered
    once (small distinct), then each level above the leaves aggregates
    its children's ``summary-else-content`` in sibling order joined
    with "\\n\\n" (summarizer.py:137-141) and summarizes that input.
    """
    keep = ["url", "path_key"]
    depths = sorted(
        (r["depth"] for r in chunks.select("depth").distinct().collect()), reverse=True
    )
    if not depths:
        return chunks.withColumn("summary", F.lit(None).cast("string"))
    max_depth = depths[0]

    # leaves (at any depth) summarize their own content
    leaf_sum = _summ_stage(chunks.where("is_leaf"), "content", keep)
    summaries = leaf_sum  # (url, path_key, summary)

    for d in [d for d in depths if d < max_depth]:
        parents = chunks.where((F.col("depth") == d) & ~F.col("is_leaf"))
        kids = (
            chunks.where(F.col("depth") == d + 1)
            .join(summaries, ["url", "path_key"], "left")
            .select(
                "url",
                F.col("parent_path").alias("path_key"),
                "sibling_order",
                F.when(
                    F.length(F.trim(F.coalesce("summary", F.lit("")))) > 0, F.col("summary")
                )
                .otherwise(F.col("content"))
                .alias("child_text"),
            )
        )
        agg_in = kids.groupBy("url", "path_key").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sibling_order", "child_text"))),
                    lambda x: x["child_text"],
                ),
                "\n\n",
            ).alias("agg_text")
        )
        lvl = _summ_stage(
            parents.select("url", "path_key").join(agg_in, ["url", "path_key"]),
            "agg_text",
            keep,
        )
        summaries = summaries.unionByName(lvl)

    return chunks.join(summaries, ["url", "path_key"], "left")


def document_summaries(chunks_summarized: DataFrame) -> DataFrame:
    """Corpus-level summary from top-level (depth==min) children —
    reference summarizer.py:150-157. Returns (url, summary)."""
    min_depth = chunks_summarized.agg(F.min("depth")).collect()[0][0]
    top = chunks_summarized.where(F.col("depth") == min_depth).select(
        "url",
        "sibling_order",
        F.when(F.length(F.trim(F.coalesce("summary", F.lit("")))) > 0, F.col("summary"))
        .otherwise(F.col("content"))
        .alias("child_text"),
    )
    agg = top.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sibling_order", "child_text"))),
                lambda x: x["child_text"],
            ),
            "\n\n",
        ).alias("agg_text")
    )
    return _summ_stage(agg, "agg_text", ["url"])


# ---------------------------------------------------------------- embeddings


def embed_texts_np(texts: list[str], dim: int = DEFAULT_EMBED_DIM) -> np.ndarray:
    """Feature-hashed bag-of-tokens, L2-normalized. Deterministic,
    dimension-stable, batch-vectorized. The model slot for W6.

    Token -> (bucket, sign) is memoized per call: natural-language
    batches repeat tokens heavily, so the FNV hash runs once per
    distinct token per batch instead of once per occurrence."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    memo: dict[str, tuple[int, float]] = {}
    counts = np.empty(len(texts), dtype=np.int64)
    flat: list[str] = []
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall((t or "").lower())
        flat.extend(toks)
        counts[i] = len(toks)
    if flat:
        # hash once per DISTINCT token (np.unique), then one vectorized
        # scatter-add — the per-occurrence Python `out[i, b] += s` loop
        # was ~20M interpreter iterations per bench run (round 6)
        uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
        ub = np.empty(len(uniq), dtype=np.int64)
        us = np.empty(len(uniq), dtype=np.float32)
        for j, tok in enumerate(uniq):
            bs = memo.get(tok)
            if bs is None:
                h = hash_token(tok)
                bs = memo[tok] = (h % dim, 1.0 if (h >> 16) % 2 == 0 else -1.0)
            ub[j], us[j] = bs
        rows = np.repeat(np.arange(len(texts)), counts)
        np.add.at(out, (rows, ub[inv]), us[inv])
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def hash_token(tok: str) -> int:
    """Stable 64-bit FNV-1a (Python's ``hash`` is salted per process —
    useless across executors)."""
    h = 0xCBF29CE484222325
    for b in tok.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def with_embeddings(
    df: DataFrame, text_col: str, key_cols: list[str], dim: int = DEFAULT_EMBED_DIM
) -> DataFrame:
    """(keys..., text_col) -> (keys..., vector array<float>). Pure map
    stage (mapInPandas), Arrow-batched — the reference's batch_embed
    (database.py:32-38) without the per-node UPDATE round trips."""
    schema = T.StructType(
        [df.schema[k] for k in key_cols]
        + [T.StructField("vector", T.ArrayType(T.FloatType()), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = embed_texts_np(list(pdf[text_col].fillna("")), dim)
            out = pdf[key_cols].copy()
            out["vector"] = [v for v in vecs]
            yield out

    from legal_knowledge_graph_spark.functions.partitioning import ensure_parallel

    return ensure_parallel(
        df.select(*dict.fromkeys(key_cols + [text_col]))
    ).mapInPandas(run, schema)
