"""Sources (S1-S3) — the reference's input surfaces as Spark readers.

- S1 benchmark JSON: ``Benchmark{tests: [QAGroundTruth{query, snippets:
  [{file_path, span:[s,e]}], tags}]}`` with the validator's
  sorted-disjoint-spans-per-file invariant (reference
  nodes/data_loader.py:16-51; disjointness :26-40) expressed as a
  window-lag check that returns the violating rows.
- S2 deterministic sampling: the reference's per-file seeded
  pseudo-random cap (data_loader.py:71-79) as hash-ordered limit.
- S3 corpus scan: whole-file text reads keyed by path
  (data_loader.py:94-104) via the wholetext reader; at scale the same
  rows come from the pages Iceberg table, and the "referenced-only"
  filter is a semi-join against the benchmark's file_paths.
- html -> text: native tag-strip for the ``html`` binary column (the
  input_hint's decode path) — script/style dropped, tags removed,
  entities unescaped, whitespace collapsed; pure Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_TESTS_PER_BENCHMARK = 194  # reference data_loader.py:12

SNIPPET = T.StructType(
    [
        T.StructField("file_path", T.StringType(), False),
        T.StructField("span", T.ArrayType(T.LongType()), False),
        T.StructField("answer", T.StringType(), True),
    ]
)
BENCHMARK_SCHEMA = T.StructType(
    [
        T.StructField(
            "tests",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("query", T.StringType(), False),
                        T.StructField("snippets", T.ArrayType(SNIPPET), False),
                        T.StructField("tags", T.ArrayType(T.StringType()), True),
                    ]
                )
            ),
            False,
        )
    ]
)


def read_benchmark_json(spark: SparkSession, path: str) -> DataFrame:
    """S1 -> flat rows (test_id, query, tags, file_path, span_start,
    span_end, snippet_order). multiLine JSON with an explicit schema —
    no inference pass over the file."""
    raw = spark.read.schema(BENCHMARK_SCHEMA).option("multiLine", "true").json(path)
    tests = raw.select(F.posexplode("tests").alias("test_id", "t"))
    return tests.select(
        "test_id",
        F.col("t.query").alias("query"),
        F.col("t.tags").alias("tags"),
        F.posexplode("t.snippets").alias("snippet_order", "s"),
    ).select(
        "test_id",
        "query",
        "tags",
        "snippet_order",
        F.col("s.file_path").alias("file_path"),
        F.element_at("s.span", 1).alias("span_start"),
        F.element_at("s.span", 2).alias("span_end"),
    )


def validate_snippets(snippets: DataFrame) -> DataFrame:
    """The reference validator's invariant (data_loader.py:35-41):
    within each (test, file_path), snippets sorted BY SPAN START must be
    strictly disjoint — ``prev.span[1] >= cur.span[0]`` raises, i.e.
    TOUCHING spans are violations too. Returns the VIOLATING rows
    (empty == valid) — assertion-as-DataFrame, so validation itself is
    distributed. The ``snippet_order`` tiebreak mirrors the reference's
    stable ``sorted(key=span[0])`` over insertion order.

    Extension beyond the reference: a standalone degenerate-span rule
    (``span_end <= span_start``) — the reference's Snippet model never
    checks this, but an empty/negative span is always a data bug."""
    w = Window.partitionBy("test_id", "file_path").orderBy(
        "span_start", "snippet_order"
    )
    checked = snippets.withColumn("prev_end", F.lag("span_end").over(w))
    return checked.where(
        (F.col("span_end") <= F.col("span_start"))  # degenerate (extension)
        | (F.col("prev_end").isNotNull() & (F.col("span_start") <= F.col("prev_end")))
    )


def sample_tests(tests: DataFrame, key_col: str, max_tests: int = MAX_TESTS_PER_BENCHMARK) -> DataFrame:
    """S2 — deterministic hash-ordered sampling: the distributed-safe
    equivalent of the reference's per-key seeded random sort + cap."""
    return (
        tests.withColumn("_sk", F.md5(F.col(key_col).cast("string")))
        .orderBy("_sk")
        .limit(max_tests)
        .drop("_sk")
    )


def sample_tests_reference_exact(
    tests: DataFrame,
    first_fp_col: str,
    order_col: str,
    max_tests: int = MAX_TESTS_PER_BENCHMARK,
) -> DataFrame:
    """S2, byte-exact variant: reproduces the reference's sampling
    DECISIONS bit-for-bit (data_loader.py:71-79). The reference's key
    is ``(random.seed(test.snippets[0].file_path), random.random())[1]``
    — CPython seeds a str via sha512 (version-2 seeding), so the key is
    a pure deterministic function of the first snippet's file_path,
    identical on every machine. Tests sharing a first file_path get
    identical keys and the reference's ``sorted`` is stable, so the
    tiebreak is the original order (``order_col``). Computed in an
    Arrow-batched map stage; the sort+limit plans as
    TakeOrderedAndProject."""
    import random
    from typing import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        tests.schema.fields + [T.StructField("_ref_key", T.DoubleType(), False)]
    )
    cols = tests.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out["_ref_key"] = pdf[first_fp_col].map(
                lambda fp: random.Random(fp).random()
            )
            yield out

    keyed = tests.mapInPandas(run, schema)
    return (
        keyed.orderBy(F.col("_ref_key"), F.col(order_col))
        .limit(max_tests)
        .drop("_ref_key")
    )


def read_text_corpus(spark: SparkSession, glob: str) -> DataFrame:
    """S3 — whole-file UTF-8 reads keyed by path -> (url, text)."""
    return (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(glob)
        .select(F.input_file_name().alias("url"), F.col("value").alias("text"))
    )


def referenced_corpus(corpus: DataFrame, snippets: DataFrame, url_col: str = "url") -> DataFrame:
    """S3's 'referenced-only, sorted' filter: semi-join the corpus
    against the benchmark's distinct file_paths."""
    refs = snippets.select(F.col("file_path").alias(url_col)).distinct()
    return corpus.join(refs, url_col, "left_semi").orderBy(url_col)


def html_to_text(html_bin: Column) -> Column:
    """Native html->text: decode utf-8, drop script/style blocks, strip
    tags, unescape the common entities, collapse whitespace. Regex-
    based (no parser dependency) — the production slot swaps in a real
    parser via mapInPandas at the same signature; offsets derived from
    THIS text are self-consistent because extraction and querying share
    the one implementation."""
    s = html_bin.cast("string")
    s = F.regexp_replace(s, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]+>", " ")
    for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, r"\s+", " "))
