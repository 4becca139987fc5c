"""BM25 baseline tests: scores vs an independent dense-matrix
re-derivation of Lucene/ES BM25, ranking sanity, and the end-to-end
baseline eval CLI on a synthetic BEIR dataset (reference
baseline_evaluation.py, which needs Elasticsearch)."""

import json
import math
import os
from collections import Counter

import numpy as np
import pytest

from czechtriever_tpu.evaluation.bm25 import BM25Index, tokenize


def dense_bm25(corpus_texts, query, k1=1.2, b=0.75):
    """Independent O(N*V) re-derivation for the oracle."""
    docs = [tokenize(t) for t in corpus_texts]
    N = len(docs)
    avgdl = sum(len(d) for d in docs) / N
    df = Counter()
    for d in docs:
        df.update(set(d))
    scores = np.zeros(N)
    for term in tokenize(query):
        if df[term] == 0:
            continue
        idf = math.log(1 + (N - df[term] + 0.5) / (df[term] + 0.5))
        for i, d in enumerate(docs):
            tf = d.count(term)
            if tf == 0:
                continue
            denom = tf + k1 * (1 - b + b * len(d) / avgdl)
            scores[i] += idf * tf * (k1 + 1) / denom
    return scores


class TestBM25:
    TEXTS = ["the quick brown fox jumps", "quick quick lazy dog",
             "brown bears eat honey", "a fox and a dog play",
             "nothing relevant here at all whatsoever today"]

    def _index(self):
        idx = BM25Index()
        idx.index_corpus({str(i): {"title": "", "text": t}
                          for i, t in enumerate(self.TEXTS)})
        return idx

    @pytest.mark.parametrize("query", ["quick fox", "brown honey",
                                       "lazy dog play", "the"])
    def test_scores_match_dense_oracle(self, query):
        idx = self._index()
        got = idx.search(query, top_k=5)
        ref = dense_bm25(self.TEXTS, query)
        for i, s in enumerate(ref):
            if s > 0:
                assert str(i) in got
                assert got[str(i)] == pytest.approx(s, rel=1e-6)
        assert all(ref[int(d)] > 0 for d in got)

    def test_exact_match_ranks_first(self):
        idx = self._index()
        got = idx.search("brown bears honey", top_k=3)
        assert max(got, key=got.get) == "2"

    def test_title_is_indexed(self):
        idx = BM25Index()
        idx.index_corpus({"a": {"title": "zebra", "text": "plain words"},
                          "b": {"title": "", "text": "plain words"}})
        got = idx.search("zebra", top_k=2)
        assert list(got) == ["a"]

    def test_unknown_terms_empty(self):
        idx = self._index()
        assert idx.search("xylophone qqq", top_k=3) == {}


class TestBaselineCLI:
    def test_synthetic_beir(self, tmp_path):
        from czechtriever_tpu.cli import baseline_eval as be
        ds = tmp_path / "beir" / "tiny"
        os.makedirs(ds / "qrels")
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        with open(ds / "corpus.jsonl", "w") as f:
            for i, w in enumerate(words):
                f.write(json.dumps({"_id": f"d{i}", "title": "",
                                    "text": f"{w} document body"}) + "\n")
        with open(ds / "queries.jsonl", "w") as f:
            for i, w in enumerate(words[:3]):
                f.write(json.dumps({"_id": f"q{i}", "text": w}) + "\n")
        with open(ds / "qrels" / "test.tsv", "w") as f:
            f.write("query-id\tcorpus-id\tscore\n")
            for i in range(3):
                f.write(f"q{i}\td{i}\t1\n")
        res = be.evaluate_bm25(str(ds))
        # each query's unique term appears only in its gold doc
        assert res["NDCG@10"] == pytest.approx(100.0)
        assert res["Recall@10"] == pytest.approx(100.0)
        out = str(tmp_path / "m.json")
        be.main(["--dataset", "tiny", "--beir_dir", str(tmp_path / "beir"),
                 "--output", out])
        with open(out) as f:
            assert json.load(f)["tiny"]["MRR@10"] == pytest.approx(100.0)
