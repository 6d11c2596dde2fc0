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


class DocAligner:
    """Per-document alignment context: tokenization, lowercase view,
    and the token-start index are computed ONCE and reused for every
    boundary-sentence alignment in the document (the reference
    re-tokenizes per call, chunker.py:95-96 — pure waste when a doc has
    10+ sections x 2 boundaries).

    ``best_window`` semantics are EXACTLY the reference's naive scan
    (chunker.py:93-115); three sound prunings make it fast without
    changing any output (guarded by the difflib-oracle test in
    tests/test_align.py):

    1. **Verbatim fast path** — ratio()==1.0 iff the strings are equal,
       and a strict ``>`` can never improve on 1.0, so the FIRST
       token-aligned verbatim occurrence of the target is the final
       answer. Boundary sentences are verbatim in the happy path, so
       this usually answers in one ``str.find`` scan.
    2. **Length bound** — ratio() <= 2*min(la,lb)/(la+lb); windows whose
       bound can't strictly beat the best are skipped without building
       the window string.
    3. **difflib's own ladder** — real_quick_ratio/quick_ratio are
       upper bounds of ratio; only windows that pass both pay the
       quadratic ratio() cost.
    """

    __slots__ = ("content", "content_lower", "token_spans", "start_index")

    def __init__(self, content: str):
        self.content = content
        self.content_lower = content.lower()
        self.token_spans = [(m.start(), m.end()) for m in _TOKEN_RE.finditer(content)]
        self.start_index = {s: i for i, (s, _) in enumerate(self.token_spans)}

    def best_window(self, target_sentence: str) -> tuple[int, int, float]:
        """First-wins argmax of SequenceMatcher.ratio over token windows."""
        token_spans = self.token_spans
        target_words = _TOKEN_RE.findall(target_sentence)
        window = len(target_words)
        if window <= 0 or not token_spans:
            return 0, 0, 0.0

        content_lower = self.content_lower
        target_lower = target_sentence.lower()
        la = len(target_lower)

        n_windows = len(token_spans) - window + 1
        if n_windows > 0 and la > 0:
            # fast path: earliest window whose text equals the target is
            # the first ratio-1.0 window (equality <=> ratio 1.0), wins.
            start_index = self.start_index
            pos = content_lower.find(target_lower)
            while pos != -1:
                i = start_index.get(pos)
                if (
                    i is not None
                    and i < n_windows
                    and token_spans[i + window - 1][1] == pos + la
                ):
                    return pos, pos + la, 1.0
                pos = content_lower.find(target_lower, pos + 1)

        # If the target has more tokens than the content, no full window
        # exists: the scan range is empty and the initialized (0, 0, -1.0)
        # is returned — matching the reference's loop bounds exactly.
        best_score = -1.0
        best_start, best_end = 0, 0
        matcher = difflib.SequenceMatcher(None, target_lower, "")
        for i in range(n_windows):
            w_start = token_spans[i][0]
            w_end = token_spans[i + window - 1][1]
            lb = w_end - w_start
            # length upper bound: cannot strictly beat best -> same
            # result as evaluating (strict > keeps first-wins ties)
            if la + lb > 0 and 2.0 * min(la, lb) / (la + lb) <= best_score:
                continue
            matcher.set_seq2(content_lower[w_start:w_end])
            if (
                matcher.real_quick_ratio() <= best_score
                or matcher.quick_ratio() <= best_score
            ):
                continue
            score = matcher.ratio()
            if score > best_score:
                best_score = score
                best_start, best_end = w_start, w_end
        return best_start, best_end, best_score

    def sentence_range(self, start_sentence: str, end_sentence: str) -> tuple[int, int]:
        """(start of best start-window, end of best end-window),
        swapped if inverted and clamped to [0, len(content)] —
        reference chunker.py:118-121 + 154-158."""
        s_start, _, _ = self.best_window(start_sentence)
        _, e_end, _ = self.best_window(end_sentence)
        s, e = s_start, e_end
        if e < s:
            s, e = e, s
        n = len(self.content)
        s = max(0, min(s, n))
        e = max(0, min(e, n))
        return s, e


def best_window_by_words(content: str, target_sentence: str) -> tuple[int, int, float]:
    """One-shot form (builds a DocAligner); prefer DocAligner when
    aligning many sentences against the same content."""
    return DocAligner(content).best_window(target_sentence)


def find_sentence_range(content: str, start_sentence: str, end_sentence: str) -> tuple[int, int]:
    """One-shot form of DocAligner.sentence_range."""
    return DocAligner(content).sentence_range(start_sentence, end_sentence)


def align_many(content: str, sentences: list[tuple[str, str]]) -> list[tuple[int, int]]:
    """Align many (start_sentence, end_sentence) pairs against one
    content string — amortizes tokenization across a document's
    sections (the batched shape used inside the chunker stage)."""
    aligner = DocAligner(content)
    return [aligner.sentence_range(s, e) for s, e in sentences]
