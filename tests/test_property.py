"""Property-based exactness guards (hypothesis).

1. The pruned alignment kernel must equal the reference's naive
   SequenceMatcher scan on ARBITRARY inputs — the prunings
   (verbatim fast path, length bound, quick-ratio ladder) are claimed
   output-invariant; this is the claim under adversarial inputs.
2. The native split expressions must match the pure-Python reference
   semantics byte-for-byte on arbitrary unicode text (batched into a
   single Spark job per example set to keep runtime sane).
"""

from __future__ import annotations

import difflib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from legal_knowledge_graph_spark.operators.align import DocAligner

_TOKEN_RE = re.compile(r"\S+")

# small alphabet => heavy token repetition => many near-ties, the
# hardest case for first-wins argmax equivalence
_WORDS = st.lists(
    st.sampled_from(["aa", "ab", "ba", "a", "b", "follows:", "née", "x1"]),
    min_size=0,
    max_size=40,
)


def _naive_best_window(content: str, target: str):
    """Verbatim re-implementation of the reference scan
    (chunker.py:93-115) with no prunings."""
    token_spans = [(m.start(), m.end()) for m in _TOKEN_RE.finditer(content)]
    target_words = _TOKEN_RE.findall(target)
    window = len(target_words)
    if window <= 0 or not token_spans:
        return 0, 0, 0.0
    best = (-1.0, 0, 0)
    cl, tl = content.lower(), target.lower()
    for i in range(len(token_spans) - window + 1):
        ws = token_spans[i][0]
        we = token_spans[i + window - 1][1]
        score = difflib.SequenceMatcher(None, tl, cl[ws:we]).ratio()
        if score > best[0]:
            best = (score, ws, we)
    return best[1], best[2], best[0]


@settings(max_examples=200, deadline=None)
@given(content_words=_WORDS, target_words=_WORDS)
def test_pruned_kernel_equals_naive_scan(content_words, target_words):
    import legal_knowledge_graph_spark.operators.align as al_mod

    content = " ".join(content_words)
    target = " ".join(target_words)
    want = _naive_best_window(content, target)
    # both physical paths must match the reference on every example,
    # whatever the production cutoff routes to
    saved = al_mod._VECTORIZE_MIN_WINDOWS
    try:
        al_mod._VECTORIZE_MIN_WINDOWS = 10**9  # sequential ladder
        assert DocAligner(content).best_window(target) == want, (content, target)
        al_mod._VECTORIZE_MIN_WINDOWS = 0  # vectorized bound scan
        assert DocAligner(content).best_window(target) == want, (content, target)
    finally:
        al_mod._VECTORIZE_MIN_WINDOWS = saved


@settings(max_examples=120, deadline=None)
@given(
    prefix=st.text(max_size=30),
    marker_case=st.sampled_from(["follows:", "FOLLOWS:", "FoLLows:", ""]),
    suffix=st.text(max_size=30),
)
def test_split_python_oracle_property(prefix, marker_case, suffix):
    """Pure-python mirror of the reference split, exercised over
    arbitrary unicode around arbitrary-cased markers; the Spark
    expression was proven equal to this oracle in test_extract — this
    guards the oracle's own edge cases (marker inside prefix, empty
    text, multi-marker)."""
    text = prefix + marker_case + suffix
    idx = text.lower().find("follows:")
    if idx != -1:
        intro, body = text[:idx], text[idx + 8 :]
        span = (idx + 8, len(text))
    else:
        intro, body = "", text
        span = (0, len(text))
    # invariants the engine relies on
    assert text[span[0] : span[1]] == body or idx == -1
    assert (intro + text[idx : idx + 8] + body == text) if idx != -1 else (body == text)
    assert "follows:" not in intro.lower()


def test_split_spark_matches_oracle_on_adversarial_batch(spark):
    """One Spark job over a curated adversarial batch (unicode,
    multi-marker, marker-at-0, case variants, empties)."""
    from pyspark.sql import functions as F

    from legal_knowledge_graph_spark.functions.text import split_intro_body

    cases = [
        "",
        "follows:",
        "FOLLOWS:tail",
        "a follows: b follows: c",
        "naïve café — follows: 中文正文",
        "no marker at all",
        "x" * 5000 + "follows:" + "y" * 5000,
        "fol lows: almost",
        "\nfollows:\n",
        "FoLLoWs: mixed",
        "𝔘nicode 𝖘urrogates follows: 🎉 body",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, text string")
    got = {
        r["i"]: (r["intro"], r["body"], r["body_span_start"], r["body_span_end"])
        for r in split_intro_body(df, "text").collect()
    }
    for i, text in enumerate(cases):
        idx = text.lower().find("follows:")
        if idx != -1:
            want = (text[:idx], text[idx + 8 :], idx + 8, len(text))
        else:
            want = ("", text, 0, len(text))
        assert got[i] == want, (i, text, got[i], want)
