"""Similarity search over embedding columns (``array<float>``).

Two paths:
- **brute-force top-k** (the exact baseline): native cosine expression
  + ``orderBy().limit(k)`` -> TakeOrderedAndProject. Exact, one scan,
  no index; right up to ~10^8 vectors per query batch on a cluster.
- **hyperplane-LSH bucketed** (the scale path): sign-random-projection
  bucket per vector (deterministic md5-derived hyperplanes), queries
  probe only their bucket (+ optional multi-probe neighbors). Recall
  < 1 by construction; the exact path is the correctness oracle.

Both are pure DataFrame ops. Batched many-query search is a
broadcast join of the (small) query set against the vector table —
the big table never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from legal_knowledge_graph_spark.operators.query import cosine
from legal_knowledge_graph_spark.operators.summarize import hash_token


def brute_force_top_k(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_vector: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine against one query vector. Returns
    (id, score, rank); ties broken by id for determinism."""
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    scored = vectors.select(
        F.col(id_col).alias("id"), cosine(F.col(vec_col), qv).alias("score")
    )
    w = Window.orderBy(F.desc("score"), F.col("id"))
    return (
        scored.orderBy(F.desc("score"), "id")
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def batch_top_k(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k for MANY queries: broadcast the query set, score
    every (query, vector) pair, per-query window top-k. The vector
    table is scanned once and never shuffled (the window partitions by
    query id over the scored projection)."""
    q = F.broadcast(
        queries.select(F.col(q_id_col).alias("qid"), F.col(q_vec_col).alias("qv"))
    )
    scored = vectors.crossJoin(q).select(
        "qid",
        F.col(id_col).alias("id"),
        cosine(F.col(vec_col), F.col("qv")).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.col("id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-agnostic hyperplane from the
    portable FNV token hash (same one the embedder uses)."""
    return [
        1.0 if (hash_token(f"hp:{plane}:{j}") >> 8) % 2 == 0 else -1.0
        for j in range(dim)
    ]


def lsh_bucket(
    vectors: DataFrame, vec_col: str, dim: int, n_planes: int = 8
) -> DataFrame:
    """Add a sign-random-projection ``lsh_bucket`` int column: bit p =
    sign(v . hyperplane_p). 2^n_planes buckets; cosine-similar vectors
    collide with high probability."""
    out = vectors
    bucket = F.lit(0)
    for p in range(n_planes):
        hp = F.array(*[F.lit(x) for x in _hyperplane(dim, p)])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), hp, lambda a, b: a * b),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return out.withColumn("lsh_bucket", bucket.cast("int"))


def lsh_top_k(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_vector: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket. At scale
    the bucketed table is written partitioned by ``lsh_bucket`` so this
    prunes the scan to ~1/2^planes of the data."""
    import numpy as np

    qv = np.asarray(query_vector, dtype="float64")
    qbucket = 0
    for p in range(n_planes):
        if float(np.dot(qv, np.asarray(_hyperplane(dim, p)))) >= 0:
            qbucket += 2**p
    bucketed = lsh_bucket(vectors, vec_col, dim, n_planes)
    return brute_force_top_k(
        bucketed.where(F.col("lsh_bucket") == qbucket), id_col, vec_col, query_vector, k
    )
