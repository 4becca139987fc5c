"""BM25 lexical retrieval baseline.

The reference's BM25 baseline (/root/reference/baseline_evaluation.py)
delegates to an external Elasticsearch service via BEIR's BM25Search —
a Java dependency that does not exist here. This module provides the
same *capability* natively: an in-memory Okapi BM25 index with
Elasticsearch-default parameters (k1=1.2, b=0.75, BM25 similarity) over
the BEIR corpus format, returning results in the evaluate() contract so
the same trec metrics apply.

Scoring is vectorized: the corpus is a CSR-like term->postings map with
precomputed idf and length norms; a query scores only the docs
containing at least one query term.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Mapping, Optional

import numpy as np

_TOKEN = re.compile(r"\w+", re.UNICODE)


def tokenize(text: str) -> List[str]:
    """Lowercased unicode word tokens (ES 'standard' analyzer spirit)."""
    return _TOKEN.findall(text.lower())


class BM25Index:
    def __init__(self, k1: float = 1.2, b: float = 0.75):
        self.k1 = k1
        self.b = b
        self.doc_ids: List[str] = []
        self.doc_len: Optional[np.ndarray] = None
        self.avgdl: float = 0.0
        self.idf: Dict[str, float] = {}
        # term -> (doc_index array, term-frequency array)
        self.postings: Dict[str, tuple] = {}

    def index_corpus(self, corpus: Mapping[str, Mapping[str, str]]) -> None:
        """corpus[docid] = {title, text} (BEIR format; title+' '+text)."""
        self.doc_ids = list(corpus.keys())
        doc_len = np.zeros(len(self.doc_ids), np.float32)
        raw: Dict[str, List[List[int]]] = defaultdict(list)
        df: Counter = Counter()
        for i, did in enumerate(self.doc_ids):
            c = corpus[did]
            text = ((c.get("title") or "") + " " + c["text"]).strip()
            toks = tokenize(text)
            doc_len[i] = len(toks)
            tf = Counter(toks)
            df.update(tf.keys())
            for term, f in tf.items():
                raw[term].append([i, f])
        self.doc_len = doc_len
        self.avgdl = float(doc_len.mean()) if len(doc_len) else 0.0
        N = len(self.doc_ids)
        # Lucene/ES BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5))
        self.idf = {t: math.log(1.0 + (N - n + 0.5) / (n + 0.5))
                    for t, n in df.items()}
        self.postings = {
            t: (np.array([p[0] for p in plist], np.int32),
                np.array([p[1] for p in plist], np.float32))
            for t, plist in raw.items()}

    def search(self, query: str, top_k: int) -> Dict[str, float]:
        assert self.doc_len is not None, "index_corpus first"
        scores: Dict[int, float] = defaultdict(float)
        norm = 1.0 - self.b + self.b * self.doc_len / max(self.avgdl, 1e-9)
        for term in tokenize(query):
            post = self.postings.get(term)
            if post is None:
                continue
            docs, tf = post
            s = self.idf[term] * tf * (self.k1 + 1) / (
                tf + self.k1 * norm[docs])
            for d, v in zip(docs, s):
                scores[int(d)] += float(v)
        best = sorted(scores.items(), key=lambda kv: -kv[1])[:top_k]
        return {self.doc_ids[d]: v for d, v in best}

    def retrieve(self, queries: Mapping[str, str], top_k: int = 1000
                 ) -> Dict[str, Dict[str, float]]:
        """results[qid][docid] = score — EvaluateRetrieval contract."""
        return {qid: self.search(q, top_k) for qid, q in queries.items()}
