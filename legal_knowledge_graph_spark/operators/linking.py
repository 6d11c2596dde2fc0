"""Entity linking & canonicalization (C1 decomposition).

Distributed decomposition of the reference's in-memory single-linkage
clustering (reference: utils/cluster.py:4-26), per the north star:

1. **Normalize** surfaces natively (lower, suffix unification) — the
   exact-match tier collapses case/suffix variants for free.
2. **Block** with MinHash-LSH over character 3-gram shingles — built
   directly on DataFrame ops (explode shingles -> per-permutation min
   of xxhash64 -> band keys -> self-join on band key). Deterministic,
   no fitted model, no pyspark.ml dependency.
3. **Score** candidate pairs with ``difflib.SequenceMatcher.ratio``
   (the same family as the F1 alignment kernel) in a batched Arrow
   stage; keep pairs with ratio >= threshold as edges.
4. **Cluster** edges with large-star/small-star connected components;
   canonical id = lexicographic min normalized surface per component.

Scale design:
- everything is keyed by *distinct normalized surface*, not mention —
  the mention table (trillions of rows at 10^12 docs) is reduced with
  one map-side-combinable ``distinct`` before any pairwise work.
- band buckets are capped (``max_block``): a stop-surface bucket of B
  members would otherwise emit B^2 pairs. Dropped buckets are
  countable on demand (pass ``metrics=`` to candidate_pairs /
  link_entities).
- the canonical map output is small (distinct surfaces), so consumers
  broadcast it against the triple table — the big table never
  shuffles for canonicalization.
"""

from __future__ import annotations

import difflib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from legal_knowledge_graph_spark.functions.text import normalize_surface
from legal_knowledge_graph_spark.operators.cc import connected_components

DEFAULT_BANDS = 8
DEFAULT_ROWS_PER_BAND = 2
DEFAULT_RATIO_THRESHOLD = 0.84
DEFAULT_MAX_BLOCK = 64


def surface_shingles(df: DataFrame, col: str = "surface_norm") -> DataFrame:
    """(surface_norm) -> exploded distinct (surface_norm, gram) char
    3-grams; strings shorter than 3 contribute themselves."""
    grams = F.when(
        F.length(col) >= 3,
        F.expr(f"transform(sequence(0, length({col}) - 3), i -> substring({col}, i + 1, 3))"),
    ).otherwise(F.array(F.col(col)))
    return df.select(col, F.explode(F.array_distinct(grams)).alias("gram"))


def candidate_pairs(
    surfaces: DataFrame,
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    max_block: int = DEFAULT_MAX_BLOCK,
    metrics: dict | None = None,
) -> DataFrame:
    """surfaces(surface_norm) -> (left, right) candidate pairs.

    MinHash with ``bands * rows_per_band`` permutations; a pair is a
    candidate if all minhashes of any band agree. Returns normalized
    surface string pairs with left < right.

    Signatures use ONE xxhash64 per gram + integer permutations
    ``(a_j * g + b_j) mod P`` (the scheme dedup.minhash_signatures
    uses) — ~n_perm x cheaper than hashing every (gram, j) pair, with
    the same collision behavior.
    """
    from legal_knowledge_graph_spark.operators.dedup import MINHASH_P, _perm_coeffs

    shingled = surface_shingles(surfaces)
    n_perm = bands * rows_per_band
    g = F.pmod(F.xxhash64(F.col("gram")), F.lit(MINHASH_P))
    hashed = shingled.select("surface_norm", g.alias("g"))
    aggs = [
        F.min((F.col("g") * F.lit(a) + F.lit(b)) % MINHASH_P).alias(f"h{j}")
        for j, (a, b) in enumerate(_perm_coeffs(n_perm))
    ]
    sigs = hashed.groupBy("surface_norm").agg(*aggs)

    band_keys = [
        F.xxhash64(
            F.lit(b), *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        )
        for b in range(bands)
    ]
    banded = sigs.select(
        "surface_norm", F.explode(F.array(*band_keys)).alias("band_key")
    )

    # Cap pathological buckets (stop-surface blocks). Drops are
    # counted on demand via ``metrics`` (one extra tiny aggregation).
    sizes = banded.groupBy("band_key").agg(F.count(F.lit(1)).alias("bs"))
    if metrics is not None:
        dropped = (
            sizes.where(F.col("bs") > max_block)
            .agg(
                F.count(F.lit(1)).alias("nb"),
                F.coalesce(F.sum("bs"), F.lit(0)).alias("nr"),
            )
            .first()
        )
        metrics["dropped_buckets"] = int(dropped["nb"])
        metrics["dropped_rows"] = int(dropped["nr"])
    # anti-join cap (same rationale as dedup._banded_pairs: the inner
    # size join shuffled the banded table a second time; broadcast not
    # forced — the oversized set is data-dependent, AQE decides)
    oversized = sizes.where(F.col("bs") > max_block).select("band_key")
    banded = banded.join(oversized, "band_key", "left_anti")

    left = banded.select("band_key", F.col("surface_norm").alias("left"))
    right = banded.select("band_key", F.col("surface_norm").alias("right"))
    pairs = (
        left.join(right, "band_key")
        .where(F.col("left") < F.col("right"))
        .select("left", "right")
        .distinct()
    )
    return pairs


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


_NUM_RE = __import__("re").compile(r"\d+")


def _pair_score(a: str, b: str) -> float:
    """Fuzzy pair score with a numeric-identifier gate.

    Distinct numeric tokens are strong evidence of distinct entities
    (doc numbers, entity registry ids): if the numeric-token sequences
    differ, the pair scores 0 regardless of string similarity — this is
    what keeps 'solar falcon 101 corp' and 'polar falcon 109 corp'
    apart while still merging typo variants of the same entity.
    """
    if _NUM_RE.findall(a) != _NUM_RE.findall(b):
        return 0.0
    return difflib.SequenceMatcher(None, a, b).ratio()


def score_pairs(pairs: DataFrame, threshold: float | None = None) -> DataFrame:
    """Batched fuzzy scoring of candidate pairs (Arrow batches).

    With ``threshold`` set, only pairs scoring >= threshold are emitted
    (their scores are EXACT ratios) and the per-pair cost drops via the
    same pruning ladder the align kernel proves safe under a difflib
    oracle (operators/align.py:100-118): numeric gate, then the length
    upper bound ``2*min(la,lb)/(la+lb)``, then ``real_quick_ratio`` /
    ``quick_ratio`` — each an upper bound on ``ratio()``, so a pair any
    rung proves below threshold cannot be kept and skips the quadratic
    ``ratio()`` entirely. ``threshold=None`` scores every pair exactly
    (the audit path; tests assert the two paths agree on kept pairs).
    """

    def run_all(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores = [_pair_score(a, b) for a, b in zip(pdf["left"], pdf["right"])]
            yield pd.DataFrame({"left": pdf["left"], "right": pdf["right"], "score": scores})

    if threshold is None or threshold <= 0.0:
        # thr <= 0 keeps everything (even numeric-gated zeros), so the
        # pruned path's skip-on-gate would change the result — score all
        out = pairs.mapInPandas(run_all, _PAIR_SCHEMA)
        return out if threshold is None else out.where(F.col("score") >= threshold)

    thr = float(threshold)

    def run_pruned(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep_l, keep_r, keep_s = [], [], []
            for a, b in zip(pdf["left"], pdf["right"]):
                if _NUM_RE.findall(a) != _NUM_RE.findall(b):
                    continue  # numeric gate: score would be 0.0
                la, lb = len(a), len(b)
                if la + lb > 0 and 2.0 * min(la, lb) / (la + lb) < thr:
                    continue
                m = difflib.SequenceMatcher(None, a, b)
                if m.real_quick_ratio() < thr or m.quick_ratio() < thr:
                    continue
                score = m.ratio()
                if score >= thr:
                    keep_l.append(a)
                    keep_r.append(b)
                    keep_s.append(score)
            yield pd.DataFrame({"left": keep_l, "right": keep_r, "score": keep_s})

    return pairs.mapInPandas(run_pruned, _PAIR_SCHEMA)


def link_entities(
    mentions: DataFrame,
    ratio_threshold: float = DEFAULT_RATIO_THRESHOLD,
    bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    max_block: int = DEFAULT_MAX_BLOCK,
    metrics: dict | None = None,
) -> DataFrame:
    """mentions(url, surface, ...) -> canonical map
    (surface_norm, canonical_id, component).

    ``canonical_id`` is the lexicographically smallest normalized
    surface in the component — deterministic and content-derived, so
    re-runs produce identical ids (idempotent materialization).
    """
    # The distinct surface table is the stage's hub: candidate_pairs,
    # the sid map, and the final assignment all consume it, and the CC
    # convergence loop adds its own actions on top — without a
    # checkpoint the mention-scan -> normalize -> distinct lineage
    # re-executes once per downstream action (measured 3x at bench SF).
    # It is also the SMALL table of the design (distinct surfaces, not
    # mentions), so materializing it is cheap at any scale.
    surfaces = (
        mentions.select(normalize_surface(F.col("surface")).alias("surface_norm"))
        .where(F.length("surface_norm") > 0)
        .distinct()
        .localCheckpoint(eager=False)
    )
    # stable numeric node ids for CC
    with_id = surfaces.withColumn("sid", F.xxhash64("surface_norm"))

    pairs = candidate_pairs(surfaces, bands, rows_per_band, max_block, metrics)
    edges_str = score_pairs(pairs, threshold=ratio_threshold)

    sid_map = with_id.select("surface_norm", "sid")
    edges = (
        edges_str.join(sid_map.withColumnRenamed("surface_norm", "left").withColumnRenamed("sid", "src"), "left")
        .join(sid_map.withColumnRenamed("surface_norm", "right").withColumnRenamed("sid", "dst"), "right")
        .select("src", "dst")
    )

    comp = connected_components(edges)
    # assigned feeds two consumers (the reps aggregation and the final
    # join) — checkpoint so the CC output join runs once, not once per
    # consumer. Small by design: one row per distinct surface.
    assigned = (
        with_id.join(comp, with_id["sid"] == comp["node"], "left")
        .select(
            "surface_norm",
            "sid",
            F.coalesce("component", F.col("sid")).alias("component"),
        )
        .localCheckpoint(eager=False)
    )
    reps = assigned.groupBy("component").agg(F.min("surface_norm").alias("canonical_id"))
    return assigned.join(reps, "component").select("surface_norm", "canonical_id", "component")


def cluster_entity_vectors(
    entities: DataFrame,
    id_col: str = "entity_id",
    vec_col: str = "vector",
    distance_threshold: float = 0.25,
) -> DataFrame:
    """C1 vector tier — the reference's
    ``AgglomerativeClustering(metric="cosine", linkage="single",
    distance_threshold=0.25)`` (utils/cluster.py:4-26) decomposed for
    Spark: single-linkage at threshold tau is EXACTLY connected
    components over the graph whose edges join pairs with
    cosine_distance < tau, so the distributed form is
    (1) exact above-similarity pair generation (broadcast matrix
    product — operators/dedup.embedding_near_duplicates) and
    (2) large-star/small-star CC. Returns
    (entity_id, cluster_id) with cluster_id = min entity id per
    component (deterministic, content-derived).

    Strictness note: sklearn's ``distance_threshold`` is exclusive
    (merge while distance < tau), so the edge rule is
    ``similarity > 1 - tau``.
    """
    from legal_knowledge_graph_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    ids = entities.select(F.col(id_col).alias("node"))
    # similarity strictly greater than 1 - tau (see note above):
    # embedding_near_duplicates uses >=, so nudge by the smallest
    # representable margin via a post-filter on the exact score is
    # unnecessary here — equality at the float boundary is measure-zero
    # and the reference's own float comparison has the same knife edge.
    pairs = embedding_near_duplicates(
        entities, id_col, vec_col, threshold=1.0 - distance_threshold
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(edges)
    return (
        ids.join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", F.col("node")).alias("cluster_id"),
        )
    )
