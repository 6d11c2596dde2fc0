"""Deterministic synthetic `pages` generator + golden fixtures.

Implements FIXTURES.md F1-F7: a Common-Crawl-style table
``pages(url, warc_ts, html, text, lang)`` of contract-like documents
with PLANTED structure, so golden triples / chunks / aliases are known
exactly. Every page is a pure function of ``(seed, i)`` — generation is
distributed via ``mapInPandas`` over ``spark.range(n)`` and is
independent of partitioning, so the same table materializes at any
scale on any cluster layout (no driver bottleneck, no RNG order
dependence).

Planted scheme (drives the P/R >= 0.95 gate):
- 400 canonical entities ``ENT{k}`` (adjective x animal x per-entity
  numeric token), each with surface variants: canonical, "Corporation"
  suffix, UPPER, lower, and a typo (one char dropped) — exercising both
  exact-normalization and fuzzy (LSH+CC) canonicalization tiers.
- One head entity (ENT0) appears in ~20% of pages: head-entity skew for
  salting / AQE skew-join tests.
- 8 closed predicates; relation sentences "SURF pred SURF." planted at
  recorded offsets -> golden_triples.
- intro + literal "follows:" marker (present ~90%, absent ~10%,
  at-position-0 ~1%) -> golden intro/body split (reference semantics:
  intro_body_separator.py:28-46).
- 2-3 ARTICLEs x 2-4 Sections with recorded body-relative spans ->
  golden_chunks (reference Chunk tree semantics: utils/model.py:19-24).
- unicode + a repeated sentence per page (alignment tie-breaking).
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 42

_ADJ = [
    "Brisk", "Solar", "Quiet", "Amber", "Cedar", "Noble", "Rapid", "Vivid",
    "Stone", "Polar", "Lunar", "Coral", "Ember", "Frost", "Gilded", "Hollow",
    "Ivory", "Jade", "Keen", "Lively",
]
_NOUN = [
    "Falcon", "Otter", "Harbor", "Meadow", "Summit", "Willow", "Anchor",
    "Beacon", "Canyon", "Delta", "Ember", "Fjord", "Glacier", "Harvest",
    "Island", "Juniper", "Kestrel", "Lantern", "Marble", "Nimbus",
]
N_ENTITIES = 400
PREDICATES = [
    "acquires", "party_to", "supplies", "owns", "cites",
    "indemnifies", "licenses", "governs",
]
_FILLER = [
    "The parties shall cooperate in good faith at all times.",
    "Notice must be delivered in writing within thirty days.",
    "This provision survives termination of the agreement.",
    "Each obligation herein is subject to applicable law.",
    "The naïve café clause — §2 — applies to both parties.",
    "All fees are payable in immediately available funds.",
    "No waiver is effective unless signed by both parties.",
]
_LANGS = ["en", "es", "zh", "de"]
ROMAN = ["I", "II", "III", "IV", "V"]


def canonical_name(k: int) -> str:
    """Canonical entity name for ENT{k} (distinct numeric token keeps
    cross-entity n-gram similarity low)."""
    return f"{_ADJ[k % 20]} {_NOUN[(k // 20) % 20]} {100 + k} Corp"


def surface_forms(k: int) -> list[str]:
    base = canonical_name(k)
    words = base.split(" ")
    noun = words[1]
    typo_noun = noun[:-2] + noun[-1] if len(noun) > 3 else noun  # drop one char
    return [
        base,                                             # canonical
        base.replace(" Corp", " Corporation"),            # suffix variant
        base.upper(),                                     # case variant
        base.lower(),                                     # case variant
        f"{words[0]} {typo_noun} {words[2]} Corp",        # typo-distance-1
    ]


def alias_table() -> list[tuple[str, str]]:
    """(surface, golden_canonical_id) for every planted surface form."""
    out = []
    for k in range(N_ENTITIES):
        for s in surface_forms(k):
            out.append((s, f"ENT{k}"))
    return out


def _pick_entity(rng: random.Random) -> int:
    # ENT0 is the head entity: ~20% of all mentions.
    if rng.random() < 0.20:
        return 0
    return rng.randrange(1, N_ENTITIES)


def page_record(i: int, seed: int = SEED) -> dict:
    """Pure function (seed, i) -> one page + its goldens.

    Returns dict with keys: url, warc_ts, html, text, lang, triples
    (list of (subj_id, pred, obj_id, span_start, span_end) — absolute
    offsets into text), chunks (list of (path_key, parent_path, depth,
    sibling_order, span_start, span_end) — BODY-relative offsets,
    matching reference chunker semantics which operate on the body),
    body_start (absolute offset where body begins).
    """
    rng = random.Random(f"pg:{seed}:{i}")
    url = f"https://ex{i % 7}.test/doc/{i}"

    parts: list[str] = []
    pos = 0

    def emit(s: str) -> int:
        nonlocal pos
        parts.append(s)
        start = pos
        pos += len(s)
        return start

    marker_mode = "none" if i % 10 == 7 else ("at0" if i % 97 == 0 else "normal")
    if marker_mode == "normal":
        emit(f"AGREEMENT NO {i}. ")
        if rng.random() < 0.3:
            emit("Entre les parties — naïve café. ")
        emit("This contract between the parties named herein is set out as ")
        emit("follows:")
        body_start = pos  # body begins right after the marker
        emit("\n")
    elif marker_mode == "at0":
        emit("follows:")
        body_start = pos
        emit("\n")
    else:
        # no marker: body is the whole text
        body_start = 0
    triples: list[tuple] = []
    chunks: list[tuple] = []

    n_articles = 2 + (i % 2)
    for a in range(n_articles):
        art_key = f"ARTICLE_{ROMAN[a]}"
        emit(f"ARTICLE {ROMAN[a]}. GENERAL TERMS {ROMAN[a]}\n")
        n_sections = 2 + rng.randrange(3)
        sec_spans = []
        for s in range(n_sections):
            sec_key = f"{art_key}/section_{a + 1}_{s + 1}"
            sec_start = pos - body_start
            emit(f"Section {a + 1}.{s + 1} ")
            # Filler sentences first (the page-constant one repeats in
            # every section of the page — alignment tie-breaking), the
            # unique relation sentence LAST so end-boundary sentences
            # are unique per section.
            emit(_FILLER[i % len(_FILLER)])
            emit(" ")
            emit(_FILLER[rng.randrange(len(_FILLER))])
            emit(" ")
            subj_k = _pick_entity(rng)
            obj_k = _pick_entity(rng)
            while obj_k == subj_k:
                obj_k = rng.randrange(1, N_ENTITIES)
            pred = PREDICATES[rng.randrange(len(PREDICATES))]
            subj_surf = surface_forms(subj_k)[rng.randrange(5)]
            obj_surf = surface_forms(obj_k)[rng.randrange(5)]
            sent_start = emit(f"{subj_surf} {pred} {obj_surf}.")
            sent_end = pos
            triples.append((f"ENT{subj_k}", pred, f"ENT{obj_k}", sent_start, sent_end))
            # Section span: first token of the heading through the final
            # '.' of the relation sentence (token-boundary spans, which
            # is what the reference's word-window aligner can produce —
            # chunker.py:93-115 windows are \S+ token runs).
            sec_spans.append((sec_key, sec_start, pos - body_start, s))
            emit("\n")
        # Article span per reference internal-node aggregation
        # (chunker.py:172-173): (min child start, max child end).
        art_start = min(ss for _, ss, _, _ in sec_spans)
        art_end = max(se for _, _, se, _ in sec_spans)
        chunks.append((art_key, None, 1, a, art_start, art_end))
        for sec_key, ss, se, order in sec_spans:
            chunks.append((sec_key, art_key, 2, order, ss, se))

    text = "".join(parts)
    ts = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(seconds=137 * i)
    return {
        "url": url,
        "warc_ts": ts,
        "html": b"<html><body>" + text.encode("utf-8") + b"</body></html>",
        "text": text,
        "lang": _LANGS[i % 4],
        "triples": triples,
        "chunks": chunks,
        "body_start": body_start,
    }


PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("span_start", T.LongType(), False),
        T.StructField("span_end", T.LongType(), False),
    ]
)

CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("path_key", T.StringType(), False),
        T.StructField("parent_path", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("sibling_order", T.IntegerType(), False),
        T.StructField("span_start", T.LongType(), False),
        T.StructField("span_end", T.LongType(), False),
    ]
)


def generate_pages(spark: SparkSession, n: int, seed: int = SEED) -> DataFrame:
    """Distributed deterministic pages table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [page_record(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "url": [r["url"] for r in recs],
                    "warc_ts": [r["warc_ts"] for r in recs],
                    "html": [r["html"] for r in recs],
                    "text": [r["text"] for r in recs],
                    "lang": [r["lang"] for r in recs],
                }
            )

    parallelism = max(spark.sparkContext.defaultParallelism, 8)
    return spark.range(0, n, numPartitions=min(parallelism, max(1, n // 50 + 1))).mapInPandas(
        gen, PAGES_SCHEMA
    )


def generate_golden_triples(spark: SparkSession, n: int, seed: int = SEED) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                r = page_record(int(i), seed)
                for subj, pred, obj, s, e in r["triples"]:
                    rows.append((r["url"], subj, pred, obj, s, e))
            yield pd.DataFrame(rows, columns=["url", "subj", "pred", "obj", "span_start", "span_end"])

    return spark.range(0, n, numPartitions=max(1, n // 100 + 1)).mapInPandas(gen, TRIPLES_SCHEMA)


def generate_golden_chunks(spark: SparkSession, n: int, seed: int = SEED) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                r = page_record(int(i), seed)
                for path_key, parent, depth, order, s, e in r["chunks"]:
                    rows.append((r["url"], path_key, parent, depth, order, s, e))
            yield pd.DataFrame(
                rows,
                columns=["url", "path_key", "parent_path", "depth", "sibling_order", "span_start", "span_end"],
            )

    return spark.range(0, n, numPartitions=max(1, n // 100 + 1)).mapInPandas(gen, CHUNKS_SCHEMA)
