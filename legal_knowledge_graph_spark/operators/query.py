"""Query surface — the reference's five Cypher-backed tools as pure
DataFrame functions (Q1-Q5, SURVEY.md §2.8).

The reference exposes these as LangChain tools running Cypher against
Neo4j (src/search_knowledge_graph/tools/*); the agent loop (Q6) is an
orchestration concern, so the engine exposes the tools directly —
any agent can drive them. Every function takes the committed
``nodes``/``edges`` DataFrames and returns a DataFrame; nothing
collects.

Scale notes:
- point lookups (`node_id == X`) prune to one bucket partition (the
  tables are written partitionBy(bucket) with bucket = pmod(xxhash64
  (id), N) — the predicate is derivable, so callers pass through
  :func:`with_bucket_pruning` to add the bucket predicate explicitly).
- top-k similarity = score + ``orderBy().limit(k)`` — Catalyst plans
  TakeOrderedAndProject (no global sort materialization).
- cosine scoring is a native Catalyst expression over the zipped
  arrays (``aggregate(zip_with(...))``) — JVM-side, codegen'd; no
  Python in the loop. Vectors are L2-normalized at write time so
  cosine == dot product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from legal_knowledge_graph_spark.functions.ids import bucket
from legal_knowledge_graph_spark.functions.text import summary_else_content
from legal_knowledge_graph_spark.operators.materialize import N_BUCKETS

DEFAULT_TOP_K = 5  # reference search_chunk.py:32
DEFAULT_THRESHOLD = 0.0  # reference search_chunk.py:33


def lookup_by_id(nodes: DataFrame, ids: list[int], id_col: str = "node_id") -> DataFrame:
    """Point lookup with explicit bucket-partition pruning.

    The tables are written ``partitionBy(bucket)`` with
    ``bucket = pmod(xxhash64(id), N)``; an ``id IN (...)`` filter alone
    does not prune partitions (the optimizer cannot invert the hash),
    so the matching bucket literals are computed first — one tiny local
    job over the id literals — and added as a partition predicate. On
    Iceberg this is what hidden ``bucket(N, id)`` partitioning does
    automatically; on plain parquet it must be explicit.
    """
    ids = [int(i) for i in ids]
    spark = nodes.sparkSession
    buckets = [
        r["b"]
        for r in spark.createDataFrame([(i,) for i in ids], f"{id_col} long")
        .select(bucket(id_col, N_BUCKETS).alias("b"))
        .distinct()
        .collect()
    ]
    return nodes.where(F.col("bucket").isin(buckets) & F.col(id_col).isin(ids))


def cosine(a: Column, b: Column) -> Column:
    """Native cosine over two float arrays (dot product of
    L2-normalized vectors; full cosine if not normalized)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )
    return dot / F.when(norm(a) * norm(b) == 0, F.lit(1.0)).otherwise(norm(a) * norm(b))


def search_corpus(nodes: DataFrame) -> DataFrame:
    """Q1 (tools/search_corpus.py:23-27): all corpora ordered by name."""
    return (
        nodes.where(F.col("label") == "Corpus")
        .select(F.col("node_id").alias("contract_id"), F.col("name").alias("contract_name"))
        .orderBy("contract_name")
    )


def get_corpus_toc(nodes: DataFrame, corpus_id: int) -> DataFrame:
    """Q2 (tools/get_corpus_toc.py:29-32): point lookup -> TOC JSON."""
    return nodes.where(
        (F.col("label") == "Corpus") & (F.col("node_id") == corpus_id)
    ).select("node_id", "toc_json")


def reshape_toc(df: DataFrame, toc_col: str = "toc_json") -> DataFrame:
    """Q2 read side, full parity (tools/get_corpus_toc.py:37-121): the
    stored TOC JSON string reshaped into the components schema
    ``[{component_name, component_description, childs}]``, re-emitted
    as a compact JSON string column ``components_json``. Arrow-batched
    map stage (the reshape is quirky dict logic, not SQL — see
    functions/parse.toc_to_components for the branch-by-branch
    reproduction)."""
    from typing import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    from legal_knowledge_graph_spark.functions.parse import reshape_toc_json

    keep = [c for c in df.columns if c != toc_col]
    schema = T.StructType(
        [df.schema[k] for k in keep]
        + [T.StructField("components_json", T.StringType(), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            out["components_json"] = pdf[toc_col].map(reshape_toc_json)
            yield out

    return df.mapInPandas(run, schema)


def search_children(
    nodes: DataFrame,
    edges: DataFrame,
    parent_id: int,
    query_vector: list[float],
    top_k: int = DEFAULT_TOP_K,
    threshold: float = DEFAULT_THRESHOLD,
    sub_variant: bool = False,
) -> DataFrame:
    """Q3 (tools/search_chunk.py:35-46): 1-hop CHILD expansion from
    ``parent_id``, cosine-scored against ``query_vector``, score >
    threshold, top-k. Returns (node_id, name, text, score) where text
    follows the summary-else-content rule (search_chunk.py:42).

    ``sub_variant=True`` reproduces SearchSubComponentTool
    (search_chunk.py:108-118) exactly, including its quirk: the Cypher
    returns ``c.leaf`` — a property the write path never sets — so the
    ``leaf`` column is always null by construction."""
    kids = edges.where(
        (F.col("type") == "CHILD") & (F.col("src_id") == parent_id)
    ).select(F.col("dst_id").alias("node_id"))
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    cols = [
        F.col("node_id"),
        F.col("name"),
        summary_else_content(
            F.coalesce("summary", F.lit("")), F.coalesce("content", F.lit(""))
        ).alias("text"),
        F.col("score"),
    ]
    if sub_variant:
        cols.append(F.lit(None).cast("boolean").alias("leaf"))
    return (
        nodes.join(kids, "node_id")
        .where(F.col("vector").isNotNull())
        .withColumn("score", cosine(F.col("vector"), qv))
        .where(F.col("score") > threshold)
        .select(*cols)
        .orderBy(F.desc("score"), "node_id")
        .limit(top_k)
    )


def search_neighbors(nodes: DataFrame, edges: DataFrame, chunk_id: int) -> DataFrame:
    """Q4 (tools/search_neighbor_chunk.py:30-40): both NEXT directions,
    DISTINCT, summary-else-content."""
    fwd = edges.where((F.col("type") == "NEXT") & (F.col("src_id") == chunk_id)).select(
        F.col("dst_id").alias("node_id")
    )
    bwd = edges.where((F.col("type") == "NEXT") & (F.col("dst_id") == chunk_id)).select(
        F.col("src_id").alias("node_id")
    )
    nb = fwd.unionByName(bwd).dropDuplicates(["node_id"])
    return nodes.join(nb, "node_id").select(
        "node_id",
        "name",
        summary_else_content(
            F.coalesce("summary", F.lit("")), F.coalesce("content", F.lit(""))
        ).alias("text"),
    )


def resolve_response(
    nodes: DataFrame, pages: DataFrame, chunk_ids: list[int]
) -> DataFrame:
    """Q5 (tools/response.py:29-62): fetch chunks by id, then RECOMPUTE
    the span by locating the chunk content inside the page text,
    dropping chunks whose content is not found verbatim (the
    reference's ``content_file.find`` -> drop-if-absent semantics,
    response.py:50-61)."""
    sel = nodes.where(F.col("node_id").isin([int(i) for i in chunk_ids])).select(
        "node_id", "name", "url", "content"
    )
    joined = sel.join(pages.select("url", "text"), "url")
    loc = F.expr("instr(text, content)")  # first occurrence, 1-based, 0 if absent
    return (
        joined.withColumn("_loc", loc)
        .where(F.col("_loc") > 0)
        .select(
            "node_id",
            "name",
            F.col("url").alias("file_path"),
            (F.col("_loc") - 1).cast("long").alias("span_start"),
            (F.col("_loc") - 1 + F.length("content")).cast("long").alias("span_end"),
            "content",
        )
    )


def rank_reciprocal_scores(df: DataFrame, rank_col: str = "rank") -> DataFrame:
    """The reference's retrieval scoring glue (search.py:30-43,
    run_benchmark.py:64-87): the i-th retrieved snippet (0-based) gets
    score ``1/(i+1)`` — with a 1-based rank column that is ``1/rank``.
    Adds a ``score`` column (rounded to 6 dp for engine portability)."""
    return df.withColumn("score", F.round(F.lit(1.0) / F.col(rank_col), 6))


def span_overlap_pr(retrieved: DataFrame, golden: DataFrame) -> DataFrame:
    """The LegalBenchRAG character-overlap precision/recall metric
    (reference run_benchmark.py:122-137 delegates to the legalbenchrag
    submodule) as one DataFrame job.

    retrieved(query_id, url, span_start, span_end)
    golden(query_id, url, span_start, span_end)
    -> (query_id, precision, recall)

    Overlap length is summed over the interval-intersection join;
    P = overlap / retrieved chars, R = overlap / golden chars.
    """
    r = retrieved.select(
        "query_id",
        "url",
        F.col("span_start").alias("rs"),
        F.col("span_end").alias("re"),
    )
    g = golden.select(
        "query_id",
        "url",
        F.col("span_start").alias("gs"),
        F.col("span_end").alias("ge"),
    )
    ov = (
        r.join(g, ["query_id", "url"])
        .withColumn(
            "olap",
            F.greatest(
                F.lit(0).cast("long"),
                F.least("re", "ge") - F.greatest("rs", "gs"),
            ),
        )
        .groupBy("query_id")
        .agg(F.sum("olap").alias("overlap"))
    )
    r_len = r.groupBy("query_id").agg(F.sum(F.col("re") - F.col("rs")).alias("rlen"))
    g_len = g.groupBy("query_id").agg(F.sum(F.col("ge") - F.col("gs")).alias("glen"))
    return (
        r_len.join(g_len, "query_id", "full")
        .join(ov, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce("overlap", F.lit(0)) / F.greatest("rlen", F.lit(1))).alias("precision"),
            (F.coalesce("overlap", F.lit(0)) / F.greatest("glen", F.lit(1))).alias("recall"),
        )
    )
