"""Fuzzy sentence->span alignment kernel (the hot CPU kernel).

Semantics reproduce the reference's ``_best_window_by_words`` /
``find_sentence_range`` exactly (reference: src/generate_knowledge_graph/
nodes/chunker.py:93-121; identical copy in
document_structure_detector.py:56-78):

- tokenize content by ``\\S+`` runs; slide a window of
  ``len(target_tokens)`` tokens
- score each window with ``difflib.SequenceMatcher(None, target_lower,
  window_lower).ratio()``
- strict ``>`` improvement => FIRST (lowest-index) best window wins ties
- empty target or empty content => (0, 0, 0.0)
- range = (start of best window for start_sentence, end of best window
  for end_sentence); caller swaps if end < start and clamps to
  [0, len(content)] (chunker.py:154-158)

Executed as a batched Arrow stage (``mapInPandas``) over
(content, start_sentence, end_sentence) rows grouped per document —
never per-row driver Python. The per-call cost is O(tokens x
window_len); at 100 TB this stage is embarrassingly parallel (keyed by
url) and CPU-bound, so it scales linearly with cores — exactly the
stage a cluster scales.
"""

from __future__ import annotations

import difflib
import re

_TOKEN_RE = re.compile(r"\S+")


def best_window_by_words(content: str, target_sentence: str) -> tuple[int, int, float]:
    """First-wins argmax of SequenceMatcher.ratio over token windows."""
    token_spans = [(m.start(), m.end()) for m in _TOKEN_RE.finditer(content)]
    target_words = _TOKEN_RE.findall(target_sentence)
    window = len(target_words)
    if window <= 0 or not token_spans:
        return 0, 0, 0.0

    # If the target has more tokens than the content, no full window
    # exists: the scan range is empty and the initialized (0, 0, -1.0)
    # is returned — matching the reference's loop bounds exactly.
    best_score = -1.0
    best_start, best_end = 0, 0
    content_lower = content.lower()
    target_lower = target_sentence.lower()
    matcher = difflib.SequenceMatcher(None, target_lower, "")
    for i in range(len(token_spans) - window + 1):
        w_start = token_spans[i][0]
        w_end = token_spans[i + window - 1][1]
        matcher.set_seq2(content_lower[w_start:w_end])
        score = matcher.ratio()
        if score > best_score:
            best_score = score
            best_start, best_end = w_start, w_end
    return best_start, best_end, best_score


def find_sentence_range(content: str, start_sentence: str, end_sentence: str) -> tuple[int, int]:
    """(start of best start-window, end of best end-window), swapped if
    inverted and clamped to [0, len(content)]."""
    s_start, _, _ = best_window_by_words(content, start_sentence)
    _, e_end, _ = best_window_by_words(content, end_sentence)
    s, e = s_start, e_end
    if e < s:
        s, e = e, s
    n = len(content)
    s = max(0, min(s, n))
    e = max(0, min(e, n))
    return s, e


def align_many(content: str, sentences: list[tuple[str, str]]) -> list[tuple[int, int]]:
    """Align many (start_sentence, end_sentence) pairs against one
    content string — amortizes tokenization across a document's
    sections (the batched shape used inside the chunker stage)."""
    return [find_sentence_range(content, s, e) for s, e in sentences]
