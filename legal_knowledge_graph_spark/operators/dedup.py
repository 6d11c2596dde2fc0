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
- band-bucket self-joins cap bucket size (max_block); a stop-text
  bucket would otherwise emit B^2 pairs. Drops are countable on demand
  (pass ``metrics=`` to lsh_candidate_pairs / minhash_near_duplicates)
  and the DuckDB oracle applies the same cap, so capping never makes
  the gate inexact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_MINHASH_PERMS = 16
DEFAULT_BANDS = 4  # rows_per_band = perms // bands; 4x4 => band
# collision prob = sim^4: at jaccard 0.9 a dup pair is missed with prob
# (1-0.9^4)^4 ~ 1.4%, while the same-vocab candidate flood of 2-row
# bands (collision ~ sim^2) is suppressed ~30x
DEFAULT_JACCARD_THRESHOLD = 0.8
DEFAULT_COSINE_THRESHOLD = 0.8
DEFAULT_MAX_BLOCK = 1000
SIMHASH_BITS = 32


def _norm_text(col: Column) -> Column:
    return F.lower(F.trim(col))


def _ensure_parallel(df: DataFrame) -> DataFrame:
    """Repartition iff the input is under-partitioned (fewer partitions
    than half the default parallelism). A single-file parquet corpus
    otherwise serializes the whole shingle explode onto one core (the
    explode is the widest stage of every text tier). At cluster scale
    the input already has thousands of partitions and this is a no-op —
    it never ADDS a shuffle to a well-partitioned table."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if target > 1 and df.rdd.getNumPartitions() < max(target // 2, 2):
        return df.repartition(target)
    return df


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


#: Mersenne prime 2^31-1: permutation arithmetic stays < 2^62, so the
#: same int64 expressions evaluate identically in any engine.
MINHASH_P = 2147483647


def _perm_coeffs(n_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) permutation coefficients, a != 0."""
    out = []
    for j in range(n_perm):
        a = (2654435761 * (j + 1) + 40503) % MINHASH_P or 1
        b = (2246822519 * (j + 1) + 3266489917) % MINHASH_P
        out.append((a, b))
    return out


def minhash_signatures(
    sh: DataFrame, n_perm: int = DEFAULT_MINHASH_PERMS
) -> DataFrame:
    """(doc_id, gram) -> (doc_id, h0..h{n-1}) where
    h_j = min((a_j * g + b_j) mod P) over grams, with
    g = first-15-hex-chars of md5(gram) as int, mod P.

    One md5 per gram (not one per gram-permutation); the permutations
    are integer arithmetic, which is both ~n_perm x cheaper and
    bit-identical across engines (the DuckDB oracle reproduces the
    exact signatures)."""
    g = F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10).cast("long") % MINHASH_P
    hashed = sh.select("doc_id", g.alias("g"))
    aggs = [
        F.min((F.col("g") * F.lit(a) + F.lit(b)) % MINHASH_P).alias(f"h{j}")
        for j, (a, b) in enumerate(_perm_coeffs(n_perm))
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame,
    n_perm: int = DEFAULT_MINHASH_PERMS,
    bands: int = DEFAULT_BANDS,
    max_block: int = DEFAULT_MAX_BLOCK,
    metrics: dict | None = None,
    distinct: bool = True,
) -> DataFrame:
    """Banded LSH: pair (a, b) is a candidate iff some band's rows all
    agree. Returns (doc_a, doc_b), doc_a < doc_b.

    Band buckets larger than ``max_block`` are excluded from the
    self-join (a stop-text bucket of B members would emit B^2 pairs).
    Pass a ``metrics`` dict to have the drop COUNTED (keys
    ``dropped_buckets`` / ``dropped_rows``); the banded table is
    localCheckpointed first so the eager metrics aggregation and the
    self-join share ONE materialization of the shingle -> signature ->
    banding lineage instead of running it twice. The DuckDB oracle in
    entry_queries._sql_minhash applies the same cap, so the gate stays
    exact under capping."""
    rpb = n_perm // bands
    band_keys = [
        F.concat_ws(
            "|", F.lit(str(b)), *[F.col(f"h{b * rpb + r}") for r in range(rpb)]
        )
        for b in range(bands)
    ]
    return _banded_pairs(
        sigs.select("doc_id", F.explode(F.array(*band_keys)).alias("band_key")),
        max_block,
        metrics,
        distinct,
    )


def _banded_pairs(
    banded: DataFrame,
    max_block: int,
    metrics: dict | None,
    distinct: bool = True,
) -> DataFrame:
    if metrics is not None:
        # the metrics .first() below is an EAGER action; checkpoint so
        # it doesn't execute the signature lineage separately from the
        # self-join's execution (ADVICE round 2: metrics must not
        # double the signature-stage work)
        banded = banded.localCheckpoint(eager=False)
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
    # Cap via ANTI-join on the oversized-key set: the previous inner
    # join on band_key forced a full shuffle of the banded table just
    # to apply the cap, and the self-join below shuffles it by
    # band_key again. Oversized buckets are rare in practice (AQE
    # broadcasts the tiny set at runtime and the banded table never
    # reshuffles), but their count is data-dependent — a stop-text
    # corpus could make it large — so the broadcast is NOT forced:
    # AQE falls back to a shuffle anti-join when the set is big.
    oversized = sizes.where(F.col("bs") > max_block).select("band_key")
    banded = banded.join(oversized, "band_key", "left_anti")
    a = banded.select("band_key", F.col("doc_id").alias("doc_a"))
    b = banded.select("band_key", F.col("doc_id").alias("doc_b"))
    pairs = (
        a.join(b, "band_key")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    # ``distinct=False`` callers dedupe AFTER the (idempotent) verify:
    # a pair agreeing in k bands appears k times here, but verifying it
    # k times yields k identical rows, so the distinct moves to the
    # tiny verified output instead of shuffling the full candidate
    # flood (the multi-band duplication factor is small — bounded by
    # ``bands``).
    return pairs.distinct() if distinct else pairs


def jaccard_verify_bitset(
    sh: DataFrame,
    pairs: DataFrame,
    max_vocab: int = 1 << 16,
    max_docs: int = 1_000_000,
    max_mask_bytes: int = 1 << 28,
) -> DataFrame | None:
    """Exact Jaccard verify via broadcast **bitset popcounts** — same
    values as :func:`jaccard_verify`, different physical plan.

    When the distinct-gram vocabulary is small (char-3-grams over a
    bounded alphabet: a few hundred to tens of thousands), every doc's
    shingle set packs into a V-bit mask (V/8 bytes). The mask table
    broadcasts, and each Arrow batch of candidate pairs computes
    intersection sizes as vectorized popcount(A & B).

    Bound discipline (the driver is protected BEFORE anything large
    moves to it): the vocab is collected under a ``limit(max_vocab +
    1)`` (bounded by construction); partial masks are built per input
    partition (numpy-vectorized bit-sets, NO shuffle of the gram
    table) and checkpointed executor-side; ONE cheap ``count()`` then
    bounds the exact bytes the collect would move
    (``n_partials * mask_bytes`` vs ``max_mask_bytes``, dim-aware:
    256 MB default) before anything reaches the driver, where partials
    are OR-merged (a doc's grams sit in one partition after the narrow
    shingle explode, so partials ~= docs; a shuffled upstream inflates
    the count and the same guard catches it). Returns None when any
    bound is exceeded (caller falls back to the shuffle-join
    :func:`jaccard_verify`, the 100-TB-scale path).
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    vocab_rows = sh.select("gram").distinct().limit(max_vocab + 1).collect()
    if len(vocab_rows) > max_vocab:
        return None
    gram_idx = {g: i for i, g in enumerate(sorted(r["gram"] for r in vocab_rows))}
    nbytes = (len(gram_idx) + 7) // 8

    spark = sh.sparkSession
    b_idx = spark.sparkContext.broadcast(gram_idx)

    mask_schema = T.StructType(
        [
            sh.schema["doc_id"],
            T.StructField("mask", T.BinaryType(), False),
        ]
    )

    def build_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = b_idx.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = pdf["gram"].map(idx).to_numpy(dtype="int64")
            docs = pdf["doc_id"].to_numpy()
            order = np.argsort(docs, kind="stable")
            docs_s, codes_s = docs[order], codes[order]
            bounds = np.flatnonzero(np.r_[True, docs_s[1:] != docs_s[:-1]])
            out_docs, out_masks = [], []
            for i, start in enumerate(bounds):
                end = bounds[i + 1] if i + 1 < len(bounds) else len(docs_s)
                m = np.zeros(nbytes, dtype=np.uint8)
                c = codes_s[start:end]
                np.bitwise_or.at(m, c >> 3, (1 << (c & 7)).astype(np.uint8))
                out_docs.append(docs_s[start])
                out_masks.append(m.tobytes())
            yield pd.DataFrame({"doc_id": out_docs, "mask": out_masks})

    # executor-side materialization first, THEN the bound check, THEN
    # the driver collect — nothing unbounded ever reaches the driver.
    # (A round-5 attempt to fuse these into one `limit(cap+1).collect()`
    # was reverted: CollectLimit ships up to cap+1 rows FROM EACH
    # partition of a wave before truncating, so in the overflow case
    # the driver could buffer far more than cap rows — the count guard
    # is the only shape that bounds bytes before anything moves.)
    partials = sh.mapInPandas(build_partials, mask_schema).localCheckpoint(eager=False)
    n_partials = partials.count()
    if n_partials > max_docs or n_partials * nbytes > max_mask_bytes:
        return None
    mask_rows = partials.collect()

    # OR-merge partials into ONE contiguous (n_docs x words) uint64
    # matrix + id->row map: per-batch mask gathers become fancy
    # indexing (no per-row dict lookups / np.stack), and popcount runs
    # SWAR on uint64 words — 8x fewer elements than a uint8 gather.
    nwords = (nbytes + 7) // 8
    row_of: dict = {}
    M = np.zeros((n_partials, nwords * 8), dtype=np.uint8)
    n_docs = 0
    for r in mask_rows:
        i = row_of.get(r["doc_id"])
        if i is None:
            i = row_of[r["doc_id"]] = n_docs
            n_docs += 1
        m = np.frombuffer(r["mask"], dtype=np.uint8)
        M[i, : len(m)] |= m
    M = M[:n_docs]
    M64 = M.view(np.uint64)

    c55 = np.uint64(0x5555555555555555)
    c33 = np.uint64(0x3333333333333333)
    c0F = np.uint64(0x0F0F0F0F0F0F0F0F)
    c01 = np.uint64(0x0101010101010101)
    one, two, four, s56 = np.uint64(1), np.uint64(2), np.uint64(4), np.uint64(56)

    def _popcount_rows(x: "np.ndarray") -> "np.ndarray":
        x = x - ((x >> one) & c55)
        x = (x & c33) + ((x >> two) & c33)
        x = (x + (x >> four)) & c0F
        return ((x * c01) >> s56).sum(axis=1).astype("int64")

    # per-doc set sizes = mask popcounts, computed ONCE at build time:
    # union then comes from |A| + |B| - |A&B|, so the per-pair hot path
    # popcounts only the intersection — half the SWAR work and no A|B
    # temporary allocation.
    row_sizes = _popcount_rows(M64)

    # id -> mask-row mapping: for integer ids, a sorted array +
    # searchsorted (fully vectorized) replaces the pandas .map(dict)
    # per-pair lookup — at ~1 us/lookup the dict path cost seconds on
    # a 1M-pair candidate flood. Non-integer ids keep the dict path.
    ids_arr = np.array(list(row_of.keys()))
    int_ids = ids_arr.dtype.kind in "iu"
    if int_ids:
        sort_order = np.argsort(ids_arr, kind="stable")
        sorted_ids = ids_arr[sort_order]
        sorted_rows = np.fromiter(
            (row_of[i] for i in ids_arr[sort_order]), dtype="int64", count=len(ids_arr)
        )
        b_map = spark.sparkContext.broadcast((sorted_ids, sorted_rows))
    else:
        b_map = spark.sparkContext.broadcast(row_of)
    b_M = spark.sparkContext.broadcast(M64)
    b_sz = spark.sparkContext.broadcast(row_sizes)

    out_schema = T.StructType(
        [
            T.StructField("doc_a", sh.schema["doc_id"].dataType, False),
            T.StructField("doc_b", sh.schema["doc_id"].dataType, False),
            T.StructField("inter_size", T.LongType(), False),
            T.StructField("union_size", T.LongType(), False),
        ]
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        MM, mapping, SZ = b_M.value, b_map.value, b_sz.value
        if int_ids:
            s_ids, s_rows = mapping

            def to_rows(col: "pd.Series") -> "np.ndarray":
                vals = col.to_numpy()
                idx = np.searchsorted(s_ids, vals)
                # searchsorted returns an INSERTION index for absent
                # ids — clip + verify so an id missing from the mask
                # table fails loudly (like the dict path did) instead
                # of silently reading another document's mask
                idx = np.minimum(idx, len(s_ids) - 1)
                if not np.array_equal(s_ids[idx], vals):
                    missing = vals[s_ids[idx] != vals][:5]
                    raise KeyError(
                        f"pair ids absent from the shingle table: {missing!r}"
                    )
                return s_rows[idx]

        else:

            def to_rows(col: "pd.Series") -> "np.ndarray":
                return col.map(mapping).to_numpy(dtype="int64")

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=["doc_a", "doc_b", "inter_size", "union_size"])
                continue
            ia = to_rows(pdf["doc_a"])
            ib = to_rows(pdf["doc_b"])
            A, B = MM[ia], MM[ib]
            inter = _popcount_rows(A & B)
            union = SZ[ia] + SZ[ib] - inter
            yield pd.DataFrame(
                {
                    "doc_a": pdf["doc_a"],
                    "doc_b": pdf["doc_b"],
                    "inter_size": inter,
                    "union_size": union,
                }
            )

    return pairs.mapInPandas(verify, out_schema)


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
    max_block: int = DEFAULT_MAX_BLOCK,
    metrics: dict | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup tier: shingle -> sign -> band ->
    bucket-join -> exact-Jaccard verify. Returns
    (doc_a, doc_b, inter_size, union_size) for pairs with
    jaccard >= threshold that share >= 1 LSH band. ``metrics`` (opt-in)
    receives the capped-bucket drop counts from lsh_candidate_pairs."""
    # The shingle explosion feeds three consumers (signatures, sizes,
    # intersection); localCheckpoint materializes it once instead of
    # re-exploding ~len(text) rows per doc three times. On a cluster
    # this is a cached/checkpointed intermediate table. _ensure_parallel
    # first: a single-file corpus would otherwise explode serially.
    sh = shingles(_ensure_parallel(df), id_col, text_col, k).localCheckpoint(eager=False)
    sigs = minhash_signatures(sh, n_perm)
    # distinct deferred: the bitset verify is idempotent per pair, so
    # multi-band duplicate candidates dedupe on the (tiny) verified
    # output instead of shuffling the full candidate flood
    pairs = lsh_candidate_pairs(sigs, n_perm, bands, max_block, metrics, distinct=False)

    # Exact size-ratio prefilter (lossless): J(A,B) <= min|.|/max|.|,
    # so a pair whose shingle-set sizes differ by more than the
    # threshold ratio can never verify. Cuts the candidate flood
    # before the expensive gram-intersection join; the sizes table is
    # tiny (one int per doc) and broadcasts.
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sz_a = F.broadcast(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")))
    sz_b = F.broadcast(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")))
    pairs = (
        pairs.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .where(
            F.least("sz_a", "sz_b") >= F.lit(threshold) * F.greatest("sz_a", "sz_b")
        )
        .select("doc_a", "doc_b")
    )

    # auto-pick the verify plan: bitset popcount while the gram vocab
    # is bounded (char-k-grams usually are), shuffle-join verify beyond.
    # The bitset path verifies duplicate candidates idempotently and
    # dedupes the (small) thresholded output; the shuffle-join fallback
    # needs distinct input (its gram-join groupBy would multiply
    # intersection counts for repeated pairs).
    verified = jaccard_verify_bitset(sh, pairs)
    if verified is None:
        verified = jaccard_verify(sh, pairs.distinct())
    return verified.where(
        F.col("inter_size") >= F.lit(threshold) * F.col("union_size")
    ).distinct()


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


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_block: int = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Hamming-near SimHash pairs: (doc_a, doc_b, hamming) with
    hamming(simhash_a, simhash_b) <= max_hamming.

    Banding by the pigeonhole principle: split the 32-bit fingerprint
    into ``bands`` contiguous bit-bands — any pair within Hamming
    distance ``bands - 1`` agrees EXACTLY on at least one band, so the
    band-value bucket join finds every qualifying pair (lossless for
    ``max_hamming <= bands - 1``; the default 3 <= 4-1 qualifies).
    Entirely native expressions (shift/mask band keys, bit_count(xor)
    verify) — no Python anywhere; buckets above ``max_block`` are
    excluded like the other LSH tiers (a degenerate all-same-band
    corpus would otherwise emit B^2 pairs).
    """
    if max_hamming > bands - 1:
        raise ValueError("pigeonhole soundness needs max_hamming <= bands - 1")
    rpb = SIMHASH_BITS // bands
    fps = simhash(_ensure_parallel(df), id_col, text_col)
    band_keys = [
        (
            F.lit(b * (1 << rpb))
            + F.shiftright(F.col("simhash"), b * rpb).bitwiseAND(F.lit((1 << rpb) - 1))
        ).cast("long")
        for b in range(bands)
    ]
    banded = fps.select(
        "doc_id", F.explode(F.array(*band_keys)).alias("band_key")
    )
    # distinct deferred to the (tiny) thresholded output — the
    # Hamming verify is idempotent per pair (same rationale as the
    # MinHash tier)
    cand = _banded_pairs(banded, max_block, None, distinct=False)
    fa = fps.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    fb = fps.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


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
    union_size) for jaccard >= min_jaccard.

    When ``min_jaccard > 0`` the lossless size-ratio prefilter applies
    (J(A,B) <= min|.|/max|.|): pairs whose shingle-set sizes differ by
    more than the threshold ratio are dropped before the verify — the
    tiny per-doc size table broadcasts."""
    df = _ensure_parallel(df)
    sh = shingles(df, id_col, text_col, k).localCheckpoint(eager=False)
    blocks = df.select(F.col(id_col).alias("doc_id"), F.col(block_col).alias("blk"))
    a = blocks.select(F.col("doc_id").alias("doc_a"), "blk")
    b = blocks.select(F.col("doc_id").alias("doc_b"), "blk")
    pairs = a.join(b, "blk").where(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b")
    if min_jaccard > 0:
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
        sz_a = F.broadcast(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
        )
        sz_b = F.broadcast(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
        )
        pairs = (
            pairs.join(sz_a, "doc_a")
            .join(sz_b, "doc_b")
            .where(
                F.least("sz_a", "sz_b") >= F.lit(min_jaccard) * F.greatest("sz_a", "sz_b")
            )
            .select("doc_a", "doc_b")
        )
    verified = jaccard_verify_bitset(sh, pairs)
    if verified is None:
        verified = jaccard_verify(sh, pairs)
    return verified.where(F.col("inter_size") >= F.lit(min_jaccard) * F.col("union_size"))


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = DEFAULT_COSINE_THRESHOLD,
    max_broadcast_rows: int = 2_000_000,
    max_broadcast_bytes: int = 1 << 31,
) -> DataFrame:
    """Exact cosine near-dup pairs (doc_a, doc_b) with
    cosine >= threshold.

    Executed as a **broadcast matrix product**, not a pair join: the
    full (id, unit-vector) matrix is broadcast to every task (a 10^6 x
    64 float32 matrix is ~256 MB — broadcastable; beyond that, tile the
    right side), and each Arrow batch of left rows computes
    ``A_block @ B.T`` in one BLAS call, emitting only the above-
    threshold pairs. This avoids materializing/shuffling the O(N^2)
    pair table entirely — the crossJoin formulation moved ~12.5M
    128-float rows through a shuffle at a mere 5k vectors and is
    unusable at scale. The approximate (hyperplane-LSH) path for
    N > the caps lives in operators/similarity.py; this exact tier is
    the oracle-checkable baseline.

    Driver discipline: the cap is **dim-aware** — the row budget is
    ``min(max_broadcast_rows, max_broadcast_bytes / (dim * 8))`` (so a
    3072-dim corpus caps at ~87k rows under the 2 GB default, not a
    blind 2M), and the matrix moves through ONE Arrow-batched
    ``limit(cap + 1).toPandas()`` — no count()+collect() double action,
    and never more than cap+1 rows regardless of input size.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    base = df.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v"))
    schema_empty = "doc_a long, doc_b long"
    # dim from MAX(size) over a BOUNDED prefix, not the first row (a
    # null first vector gives size -1 and silently reverts the byte
    # cap to the blind row budget) and not the full column (that would
    # add an O(N) scan before the capped fetch, breaking this
    # function's one-bounded-action discipline). 64k rows is enough to
    # see past leading nulls/ragged rows on any sane corpus.
    head = (
        base.limit(65536)
        .agg(F.max(F.size("v")).alias("d"), F.count(F.lit(1)).alias("n"))
        .first()
    )
    if head is None or head["d"] is None or head["d"] <= 0:
        if head is not None and int(head["n"]) > 0:
            # rows exist but the probed prefix holds no valid vector —
            # returning "no duplicates" here would silently pass bad
            # input through; make the caller decide
            raise ValueError(
                "embedding_near_duplicates: first "
                f"{int(head['n'])} rows contain no non-empty vector "
                f"column {vec_col!r} — input looks malformed (all-null "
                "or empty arrays), refusing to return an empty result"
            )
        return df.sparkSession.createDataFrame([], schema_empty)
    dim = int(head["d"])
    cap = min(max_broadcast_rows, max_broadcast_bytes // (dim * 8))
    pdf_all = base.limit(cap + 1).toPandas()
    if len(pdf_all) > cap:
        raise ValueError(
            f"embedding_near_duplicates exact tier needs the vector set "
            f"to fit in a broadcast (cap {cap} rows at dim {dim}); use "
            f"similarity.embedding_near_dup_lsh above the cap"
        )
    ids = pdf_all["doc_id"].to_numpy(dtype="int64")
    mat = np.array(list(pdf_all["v"]), dtype="float64")
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_unit = spark.sparkContext.broadcast(unit)

    schema = T.StructType(
        [
            T.StructField("doc_a", T.LongType(), False),
            T.StructField("doc_b", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B_ids, B = b_ids.value, b_unit.value
        for pdf in batches:
            a_ids = pdf["doc_id"].to_numpy(dtype="int64")
            A = np.array(list(pdf["v"]), dtype="float64")
            if len(A) == 0:
                yield pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
                continue
            an = np.linalg.norm(A, axis=1, keepdims=True)
            an[an == 0] = 1.0
            sims = (A / an) @ B.T
            ai, bi = np.nonzero(sims >= threshold)
            da, db = a_ids[ai], B_ids[bi]
            keep = da < db
            yield pd.DataFrame({"doc_a": da[keep], "doc_b": db[keep]})

    return base.mapInPandas(run, schema)
