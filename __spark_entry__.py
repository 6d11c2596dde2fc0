"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship KG-construction slice at sf0.001 — planted
relation sentences -> batched triple extraction -> normalization ->
entity degree ranking (the extract->canonicalize->aggregate spine).

``queries``/``oracle_sql``: one entry per implemented operator from
SURVEY.md §2 (+ the training-data ops), each paired with an ANSI-SQL
DuckDB oracle over the same parquet tables. Definitions live in
``legal_knowledge_graph_spark/entry_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from legal_knowledge_graph_spark.entry_queries import _entity_docs
    from legal_knowledge_graph_spark.functions.text import normalize_surface
    from legal_knowledge_graph_spark.operators.triples import extract_triples

    sf_dir = "/root/testdata/sf0.001"
    triples = extract_triples(_entity_docs(spark, sf_dir))
    return (
        triples.select(
            normalize_surface(F.col("subj_surface")).alias("subj"),
            "pred",
            normalize_surface(F.col("obj_surface")).alias("obj"),
        )
        .groupBy("subj")
        .agg(
            F.count(F.lit(1)).alias("out_degree"),
            F.countDistinct("obj").alias("distinct_objects"),
            F.countDistinct("pred").alias("distinct_preds"),
        )
        .orderBy(F.desc("out_degree"), "subj")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from legal_knowledge_graph_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from legal_knowledge_graph_spark.entry_queries import ORACLES

    return dict(ORACLES)
