"""Training-data curation operators — the selection/organization layer
a 100 TB pretraining pipeline runs AFTER dedup/quality scoring:

- **near_duplicate_groups**: pairs are not actionable; curation needs
  GROUPS with a canonical representative. Composes the MinHash-LSH
  pair tier (operators/dedup.py) with large-star/small-star connected
  components (operators/cc.py): group_id = min doc id in the
  component, is_canonical marks the kept document. Everything
  distributed; the CC edge set is the (small) near-dup pair set, not
  the corpus.
- **sample_per_group**: deterministic per-group cap (e.g. at most N
  documents per host/language/bucket) — rank by md5(id) inside the
  group, keep rank <= N. Hash-ordered, so re-runs and engines agree;
  one window pass, no collect.
- **pack_sequences**: LM-pretraining sequence packing in its standard
  concat-then-chunk form: documents are concatenated in a fixed order
  per stream and cut every ``budget`` tokens; each document's
  (bin_id, bin_offset) = divmod(exclusive running token sum, budget).
  One window pass per stream; deterministic tiebreak on the id.
- **hash_split**: deterministic train/val/test assignment by md5
  bucket — stable across runs, engines, and cluster sizes (never
  rand()-based, which reshuffles per run and can't be joined
  reproducibly).

All outputs are engine-portable (md5 arithmetic, integer window math),
so each operator carries an exact DuckDB oracle in entry_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def near_duplicate_groups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float | None = None,
    pairs: DataFrame | None = None,
    **minhash_kwargs,
) -> DataFrame:
    """(doc_id, group_id, is_canonical): near-duplicate clusters from
    the MinHash tier + connected components. ``group_id`` is the
    smallest doc id reachable through above-threshold pairs (the CC
    convention of operators/cc.py), so ``is_canonical`` is simply
    ``doc_id == group_id`` — singletons are their own canonical.

    ``pairs`` (optional): a precomputed near-dup pair table with
    ``doc_a``/``doc_b`` columns (e.g. a materialized/checkpointed
    ``minhash_near_duplicates`` result). The normal curation pipeline
    needs BOTH the pair table (audit) and the groups (action); passing
    it here means the most expensive stage of the pipeline runs once,
    not twice. When omitted, the MinHash tier is computed internally."""
    from legal_knowledge_graph_spark.operators.cc import connected_components
    from legal_knowledge_graph_spark.operators.dedup import minhash_near_duplicates

    if pairs is None:
        pairs = minhash_near_duplicates(
            df, id_col, text_col, 0.8 if threshold is None else threshold,
            **minhash_kwargs,
        )
    elif threshold is not None or minhash_kwargs:
        # the supplied table was built with ITS OWN knobs — accepting
        # conflicting ones here would silently cluster at the wrong
        # threshold while the caller believes otherwise. None-sentinel
        # (not the 0.8 default value) so an EXPLICITLY passed default
        # is caught too.
        raise ValueError(
            "near_duplicate_groups: pass EITHER a precomputed pairs table "
            "OR threshold/minhash settings, not both (the supplied pairs "
            "already encode their threshold)"
        )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(edges)
    ids = df.select(F.col(id_col).alias("node"))
    return (
        ids.join(comp, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce("component", F.col("node")).alias("group_id"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("group_id"))
    )


def sample_per_group(
    df: DataFrame, group_col: str, id_col: str, n_per_group: int
) -> DataFrame:
    """Deterministic per-group cap: keep the ``n_per_group`` rows whose
    md5(id) ranks lowest inside each group. Adds ``sample_rank``
    (1-based). The hash order is unbiased w.r.t. any natural ordering
    of the data and identical on every engine/run."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_group)
    )


def pack_sequences(
    df: DataFrame,
    stream_col: str,
    order_col: str,
    token_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Concat-then-chunk sequence packing (the standard LM-pretraining
    layout): within each stream, documents are laid out in
    (order_col, id_col) order and the token stream is cut every
    ``budget`` tokens. Returns the input plus
    ``bin_id = floor(tokens_before / budget)`` and
    ``bin_offset = tokens_before % budget`` (where the document STARTS;
    long documents simply span bins, as in GPT-style packing).
    One window cumsum per stream — no driver loop, no shuffle beyond
    the stream partitioning."""
    w = (
        Window.partitionBy(stream_col)
        .orderBy(F.col(order_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return df.withColumn("_tokens_before", before).select(
        "*",
        F.floor(F.col("_tokens_before") / budget).cast("long").alias("bin_id"),
        (F.col("_tokens_before") % budget).cast("long").alias("bin_offset"),
    ).drop("_tokens_before")


def hash_split(
    df: DataFrame, id_col: str, splits: list[tuple[str, float]], resolution: int = 1_000_000
) -> DataFrame:
    """Deterministic dataset split: bucket = first-15-hex of
    md5(id) mod ``resolution``; the row gets the first split label
    whose cumulative weight covers the bucket. Weights must sum to 1.
    md5 arithmetic is bit-identical across engines (same trick as the
    MinHash oracle), so the assignment is reproducible anywhere."""
    total = sum(wt for _, wt in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % resolution
    )
    expr = None
    acc = 0.0
    for name, wt in splits[:-1]:
        acc += wt
        cond = bucket < int(round(acc * resolution))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)
