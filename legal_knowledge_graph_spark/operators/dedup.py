"""Deduplication operators for large-scale training-data pipelines.

Five tiers, all pure DataFrame ops (JVM-side, codegen'd — no Python in
any hot path):

- **exact**: md5-groupBy on normalized text.
- **MinHash + LSH**: char-3-gram shingles -> per-permutation min of
  md5(perm || gram) -> banded keys -> bucket self-join -> exact
  Jaccard verification of candidates. md5 (not xxhash64) is used as
  the permutation hash deliberately: it is bit-identical across
  engines, so the whole LSH pipeline is oracle-checkable in DuckDB.
- **SimHash**: 32-bit fingerprint; per-token md5-derived bits summed
  +1/-1 per position, sign -> bit. Hamming-near pairs via band keys.
- **n-gram Jaccard**: exact pairwise Jaccard within a blocking key.
- **embedding cosine**: exact near-dup pairs above a cosine threshold
  (brute force within blocks; the LSH-bucketed scale path is in
  operators/similarity.py).

Scale notes:
- every pairwise tier blocks first (LSH bands / explicit key); the
  only cross joins are within capped buckets.
- shingle explosion is the big intermediate: ~len(text) rows per doc.
  The groupBy(min) signature aggregation is map-side combinable, so
  the shuffle carries only (doc, perm, min-hash) rows — n_perm rows
  per doc, independent of text length.
- band-bucket self-joins cap bucket size (max_block) and COUNT what
  they drop; a stop-text bucket would otherwise emit B^2 pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_MINHASH_PERMS = 16
DEFAULT_BANDS = 8  # rows_per_band = perms // bands
DEFAULT_JACCARD_THRESHOLD = 0.8
DEFAULT_COSINE_THRESHOLD = 0.8
DEFAULT_MAX_BLOCK = 1000
SIMHASH_BITS = 32


def _norm_text(col: Column) -> Column:
    return F.lower(F.trim(col))


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical (normalized) texts.

    Returns (group_key, n_dups, doc_ids) for groups with >= 2 members.
    One map-side-combinable groupBy on a 128-bit key; never shuffles
    the text itself.
    """
    keyed = df.select(
        F.col(id_col).alias("doc_id"), F.md5(_norm_text(F.col(text_col))).alias("group_key")
    )
    return (
        keyed.groupBy("group_key")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_dups") >= 2)
    )


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(doc_id, gram): distinct char k-grams of the normalized text.
    Texts shorter than k contribute the whole text as one gram."""
    t = _norm_text(F.col(text_col))
    grams = F.when(
        F.length(t) >= k,
        F.expr(
            f"transform(sequence(0, length({_norm_sql(text_col)}) - {k}),"
            f" i -> substring({_norm_sql(text_col)}, i + 1, {k}))"
        ),
    ).otherwise(F.array(t))
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(grams)).alias("gram")
    )


def _norm_sql(text_col: str) -> str:
    return f"lower(trim({text_col}))"


def minhash_signatures(
    sh: DataFrame, n_perm: int = DEFAULT_MINHASH_PERMS
) -> DataFrame:
    """(doc_id, gram) -> (doc_id, h0..h{n-1}) where
    h_j = min(md5(j || ':' || gram)) — a string-min MinHash. md5 is
    engine-portable, so oracles reproduce signatures exactly."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("gram")))).alias(f"h{j}")
        for j in range(n_perm)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame,
    n_perm: int = DEFAULT_MINHASH_PERMS,
    bands: int = DEFAULT_BANDS,
    max_block: int = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Banded LSH: pair (a, b) is a candidate iff some band's rows all
    agree. Returns (doc_a, doc_b), doc_a < doc_b."""
    rpb = n_perm // bands
    band_keys = [
        F.concat_ws(
            "|", F.lit(str(b)), *[F.col(f"h{b * rpb + r}") for r in range(rpb)]
        )
        for b in range(bands)
    ]
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_keys)).alias("band_key")
    )
    sizes = banded.groupBy("band_key").agg(F.count(F.lit(1)).alias("bs"))
    banded = banded.join(sizes, "band_key").where(F.col("bs") <= max_block).drop("bs")
    a = banded.select("band_key", F.col("doc_id").alias("doc_a"))
    b = banded.select("band_key", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "band_key")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs from their shingle sets.
    Returns (doc_a, doc_b, inter_size, union_size) — integer columns
    only, so results are engine-portable (no float hashing issues)."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a_gr = sh.select(F.col("doc_id").alias("doc_a"), "gram")
    b_gr = sh.select(F.col("doc_id").alias("doc_b"), "gram")
    inter_counts = (
        pairs.join(a_gr, "doc_a")
        .join(b_gr, ["doc_b", "gram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    return (
        inter_counts.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("sz", "sz_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("sz", "sz_b")
        .select(
            "doc_a",
            "doc_b",
            "inter_size",
            (F.col("sz_a") + F.col("sz_b") - F.col("inter_size")).alias("union_size"),
        )
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = DEFAULT_JACCARD_THRESHOLD,
    n_perm: int = DEFAULT_MINHASH_PERMS,
    bands: int = DEFAULT_BANDS,
    k: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup tier: shingle -> sign -> band ->
    bucket-join -> exact-Jaccard verify. Returns
    (doc_a, doc_b, inter_size, union_size) for pairs with
    jaccard >= threshold that share >= 1 LSH band."""
    sh = shingles(df, id_col, text_col, k)
    sigs = minhash_signatures(sh, n_perm)
    pairs = lsh_candidate_pairs(sigs, n_perm, bands)
    verified = jaccard_verify(sh, pairs)
    return verified.where(
        F.col("inter_size") >= F.lit(threshold) * F.col("union_size")
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash over whitespace tokens
    (duplicates kept — frequency-weighted). Token hash = first 8 hex
    chars of md5 (engine-portable). Bit i of the fingerprint is 1 iff
    sum over tokens of (bit_i ? +1 : -1) > 0."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(_norm_text(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.length("tok") > 0)
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    with_bits = toks.select("doc_id", h.alias("h"))
    sums = with_bits.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    fp = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    k: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard within a blocking key (e.g.
    source/host/length-band). Returns (doc_a, doc_b, inter_size,
    union_size) for jaccard >= min_jaccard."""
    sh = shingles(df, id_col, text_col, k)
    blocks = df.select(F.col(id_col).alias("doc_id"), F.col(block_col).alias("blk"))
    a = blocks.select(F.col("doc_id").alias("doc_a"), "blk")
    b = blocks.select(F.col("doc_id").alias("doc_b"), "blk")
    pairs = a.join(b, "blk").where(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b")
    verified = jaccard_verify(sh, pairs)
    return verified.where(F.col("inter_size") >= F.lit(min_jaccard) * F.col("union_size"))


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = DEFAULT_COSINE_THRESHOLD,
    block_col: str | None = None,
) -> DataFrame:
    """Exact cosine near-dup pairs (doc_a, doc_b) with
    cosine >= threshold, optionally blocked. The approximate
    (hyperplane-LSH) scale path lives in operators/similarity.py;
    this exact tier is the oracle-checkable baseline."""
    from legal_knowledge_graph_spark.operators.query import cosine

    cols = [F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = df.select(*cols)
    a = base.select(*[F.col(c).alias(c + "_a") for c in base.columns])
    b = base.select(*[F.col(c).alias(c + "_b") for c in base.columns])
    cond = F.col("doc_id_a") < F.col("doc_id_b")
    if block_col:
        joined = a.join(b, (F.col("blk_a") == F.col("blk_b")) & cond)
    else:
        joined = a.join(b, cond)
    return (
        joined.withColumn("cos", cosine(F.col("v_a"), F.col("v_b")))
        .where(F.col("cos") >= threshold)
        .select(F.col("doc_id_a").alias("doc_a"), F.col("doc_id_b").alias("doc_b"))
    )
