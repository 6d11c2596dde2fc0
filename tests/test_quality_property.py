"""Exactness guard for the quality operators' zero-shuffle
max-multiplicity fold: the sorted-array ``aggregate`` in
repetition_stats must agree with a trivial Counter reference on an
adversarial batch — EVERY token sequence over a 2-letter alphabet up
to length 9 (maximal tie/run density), plus seeded longer randoms.
One Spark job for the whole batch (the repo's property-test pattern —
see test_property.py)."""

from __future__ import annotations

import itertools
import random
from collections import Counter

from legal_knowledge_graph_spark.operators.quality import repetition_stats


def _ref_stats(tokens: list[str]) -> tuple[int, int, int]:
    bigrams = [f"{a} {b}" for a, b in zip(tokens, tokens[1:])]
    top = max(Counter(bigrams).values()) if bigrams else 0
    ratio = (len(set(tokens)) * 1000) // len(tokens) if tokens else 0
    return len(bigrams), top, ratio


def test_bigram_fold_matches_counter_reference_exhaustive(spark):
    cases: list[list[str]] = []
    # exhaustive: every {a,b}-sequence of length 0..9 (1023 cases) —
    # the densest possible tie/run structure for the sorted fold
    for n in range(10):
        for combo in itertools.product("ab", repeat=n):
            cases.append(list(combo))
    # seeded longer randoms over a wider alphabet
    rng = random.Random(1203)
    alphabet = ["a", "b", "c", "dd", "e1", "zzz"]
    for _ in range(200):
        cases.append([rng.choice(alphabet) for _ in range(rng.randint(10, 60))])

    rows = [(i, " ".join(toks)) for i, toks in enumerate(cases)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["top_bigram_count"],
            r["distinct_token_ratio_x1000"],
        )
        for r in repetition_stats(df, "doc_id", "text").collect()
    }
    for i, toks in enumerate(cases):
        assert got[i] == _ref_stats(toks), (i, toks)
