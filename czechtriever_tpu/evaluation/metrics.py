"""Retrieval metrics with trec_eval semantics.

Native reimplementation of the pytrec_eval subset BEIR's
``EvaluateRetrieval.evaluate`` uses plus BEIR's custom metrics, which the
reference consumes at /root/reference/src/beir_utils.py:196-245 (beir and
pytrec_eval are not vendored here):

  * ndcg_cut@k   — linear gain rel_i / log2(rank+1), IDCG from the ideal
                   ranking of all judged-relevant docs cut at k
                   (trec_eval m_ndcg_cut).
  * map_cut@k    — AP with cutoff k, denominator = total relevant.
  * recall@k, P@k — binary relevance (rel > 0).
  * mrr@k        — BEIR custom: reciprocal rank of first relevant hit.
  * recall_cap@k — |rel ∩ top-k| / min(k, |rel|).
  * hole@k       — fraction of top-k docs absent from the qrels.
  * top_k_accuracy@k — any relevant doc in top-k.

Doc ordering follows trec_eval: score descending, ties broken by doc id
in descending lexicographic order.

Inputs mirror pytrec_eval: ``qrels[qid][docid] -> int rel``,
``results[qid][docid] -> float score``. Averaging matches pytrec_eval /
BEIR exactly: every query present in qrels counts in the denominator,
and a query with no positive judgments contributes 0 to every metric
(pytrec_eval emits 0 for it; BEIR's custom mrr/accuracy divide by
len(qrels)) — skipping such queries would silently inflate averages on
datasets with zero-positive queries.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, List, Mapping, Tuple

Qrels = Mapping[str, Mapping[str, int]]
Results = Mapping[str, Mapping[str, float]]


def trec_sort(doc_scores: Mapping[str, float]) -> List[str]:
    """trec_eval ordering: score desc, then docid desc."""
    return [d for d, _ in sorted(doc_scores.items(),
                                 key=lambda kv: (kv[1], kv[0]), reverse=True)]


def _per_query(qrels: Qrels, results: Results):
    for qid, rels in qrels.items():
        ranked = trec_sort(results.get(qid, {}))
        yield qid, rels, ranked


def ndcg_cut(qrels: Qrels, results: Results, k: int) -> float:
    vals = []
    for qid, rels, ranked in _per_query(qrels, results):
        pos = sorted((r for r in rels.values() if r > 0), reverse=True)
        if not pos:
            vals.append(0.0)  # pytrec_eval: judged query, zero positives
            continue
        dcg = sum(rels.get(d, 0) / math.log2(i + 2)
                  for i, d in enumerate(ranked[:k]) if rels.get(d, 0) > 0)
        idcg = sum(r / math.log2(i + 2) for i, r in enumerate(pos[:k]))
        vals.append(dcg / idcg if idcg > 0 else 0.0)
    return sum(vals) / max(1, len(vals))


def map_cut(qrels: Qrels, results: Results, k: int) -> float:
    vals = []
    for qid, rels, ranked in _per_query(qrels, results):
        R = sum(1 for r in rels.values() if r > 0)
        if R == 0:
            vals.append(0.0)
            continue
        hits, ap = 0, 0.0
        for i, d in enumerate(ranked[:k]):
            if rels.get(d, 0) > 0:
                hits += 1
                ap += hits / (i + 1)
        vals.append(ap / R)
    return sum(vals) / max(1, len(vals))


def recall(qrels: Qrels, results: Results, k: int) -> float:
    vals = []
    for qid, rels, ranked in _per_query(qrels, results):
        relset = {d for d, r in rels.items() if r > 0}
        if not relset:
            vals.append(0.0)
            continue
        vals.append(len(relset & set(ranked[:k])) / len(relset))
    return sum(vals) / max(1, len(vals))


def precision(qrels: Qrels, results: Results, k: int) -> float:
    vals = []
    for qid, rels, ranked in _per_query(qrels, results):
        relset = {d for d, r in rels.items() if r > 0}
        if not relset:
            vals.append(0.0)
            continue
        vals.append(len(relset & set(ranked[:k])) / k)
    return sum(vals) / max(1, len(vals))


def mrr(qrels: Qrels, results: Results, k: int) -> float:
    vals = []
    for qid, rels, ranked in _per_query(qrels, results):
        relset = {d for d, r in rels.items() if r > 0}
        if not relset:
            vals.append(0.0)
            continue
        rr = 0.0
        for i, d in enumerate(ranked[:k]):
            if d in relset:
                rr = 1.0 / (i + 1)
                break
        vals.append(rr)
    return sum(vals) / max(1, len(vals))


def recall_cap(qrels: Qrels, results: Results, k: int) -> float:
    vals = []
    for qid, rels, ranked in _per_query(qrels, results):
        relset = {d for d, r in rels.items() if r > 0}
        if not relset:
            vals.append(0.0)
            continue
        vals.append(len(relset & set(ranked[:k])) / min(k, len(relset)))
    return sum(vals) / max(1, len(vals))


def hole(qrels: Qrels, results: Results, k: int) -> float:
    vals = []
    for qid, rels, ranked in _per_query(qrels, results):
        top = ranked[:k]
        if not top:
            vals.append(0.0)
            continue
        vals.append(sum(1 for d in top if d not in rels) / len(top))
    return sum(vals) / max(1, len(vals))


def top_k_accuracy(qrels: Qrels, results: Results, k: int) -> float:
    vals = []
    for qid, rels, ranked in _per_query(qrels, results):
        relset = {d for d, r in rels.items() if r > 0}
        if not relset:
            vals.append(0.0)
            continue
        vals.append(1.0 if relset & set(ranked[:k]) else 0.0)
    return sum(vals) / max(1, len(vals))


DEFAULT_K_VALUES = (1, 3, 5, 10, 100, 1000)


def evaluate(qrels: Qrels, results: Results,
             k_values: Iterable[int] = DEFAULT_K_VALUES
             ) -> Tuple[Dict[str, float], Dict[str, float],
                        Dict[str, float], Dict[str, float]]:
    """BEIR EvaluateRetrieval.evaluate contract: returns
    (ndcg, map, recall, precision) dicts keyed like 'NDCG@10'."""
    ndcg = {f"NDCG@{k}": round(ndcg_cut(qrels, results, k), 5)
            for k in k_values}
    _map = {f"MAP@{k}": round(map_cut(qrels, results, k), 5)
            for k in k_values}
    rec = {f"Recall@{k}": round(recall(qrels, results, k), 5)
           for k in k_values}
    prec = {f"P@{k}": round(precision(qrels, results, k), 5)
            for k in k_values}
    return ndcg, _map, rec, prec


_CUSTOM = {"mrr": ("MRR", mrr), "recall_cap": ("R_cap", recall_cap),
           "hole": ("Hole", hole), "top_k_accuracy": ("Accuracy", top_k_accuracy)}


def evaluate_custom(qrels: Qrels, results: Results,
                    k_values: Iterable[int], metric: str) -> Dict[str, float]:
    name, fn = _CUSTOM[metric]
    return {f"{name}@{k}": round(fn(qrels, results, k), 5) for k in k_values}
