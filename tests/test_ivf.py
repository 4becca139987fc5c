"""IVF-PQ index tests: probing recall vs exhaustive PQ and flat search
on clustered data, exactness at nprobe=nlist, list packing invariants,
serialize roundtrip, memory accounting (beyond-reference component;
SURVEY.md §2.4 names IVF-PQ as the FAISS-replacement target)."""

import numpy as np
import pytest

from czechtriever_tpu.retrieval.flat import FlatIndex
from czechtriever_tpu.retrieval.ivf import IVFPQIndex
from czechtriever_tpu.retrieval.pq import PQIndex


def clustered_corpus(n=3000, d=64, n_anchors=40, seed=3):
    """Same structure as the PQ recall oracle (test_pq.py:70-78):
    anchor points + noise, unnormalized so inner products vary."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_anchors, d)).astype(np.float32)
    return (base[rng.integers(0, n_anchors, n)]
            + 0.3 * rng.normal(size=(n, d)).astype(np.float32))


class TestIVFPQ:
    def _build(self, corpus, nlist=16, nprobe=4, m=16):
        idx = IVFPQIndex(corpus.shape[1], m, 8, nlist=nlist, nprobe=nprobe,
                         train_iters=10)
        idx.index_data([str(i) for i in range(len(corpus))], corpus)
        return idx

    @pytest.mark.slow  # >15s on the CPU backend
    def test_full_probe_matches_exhaustive_pq_recall(self):
        """nprobe == nlist visits every list, so recall@10 vs flat must
        match (or beat, residual coding helps) exhaustive PQ with the
        same m."""
        corpus = clustered_corpus()
        queries = corpus[:32] + 0.05 * np.random.default_rng(1).normal(
            size=(32, 64)).astype(np.float32)

        flat = FlatIndex(64)
        flat.index_data([str(i) for i in range(len(corpus))], corpus)
        truth = [set(ids) for ids, _ in flat.search_knn(queries, 10)]

        pq = PQIndex(64, 16, 8, kmeans_iters=10)
        pq.index_data([str(i) for i in range(len(corpus))], corpus)
        pq_hits = [set(ids) for ids, _ in pq.search_knn(queries, 10)]
        pq_recall = np.mean([len(a & b) / 10
                             for a, b in zip(truth, pq_hits)])

        ivf = self._build(corpus, nlist=16, nprobe=16)
        ivf_hits = [set(ids) for ids, _ in ivf.search_knn(queries, 10)]
        ivf_recall = np.mean([len(a & b) / 10
                              for a, b in zip(truth, ivf_hits)])
        assert ivf_recall >= pq_recall - 0.05
        assert ivf_recall > 0.6

    def test_partial_probe_recall_reasonable(self):
        corpus = clustered_corpus()
        queries = corpus[100:116]
        flat = FlatIndex(64)
        flat.index_data([str(i) for i in range(len(corpus))], corpus)
        truth = [set(ids) for ids, _ in flat.search_knn(queries, 10)]
        ivf = self._build(corpus, nlist=16, nprobe=4)
        hits = [set(ids) for ids, _ in ivf.search_knn(queries, 10)]
        recall = np.mean([len(a & b) / 10 for a, b in zip(truth, hits)])
        # clustered data: 4/16 probes should still catch most neighbors
        assert recall > 0.5

    @pytest.mark.slow  # >15s on the CPU backend
    def test_scores_are_descending_and_ids_valid(self):
        corpus = clustered_corpus(n=500)
        ivf = self._build(corpus, nlist=8, nprobe=8)
        res = ivf.search_knn(corpus[:4], 20)
        for ids, scores in res:
            assert len(ids) == 20
            assert scores == sorted(scores, reverse=True)
            assert all(0 <= int(i) < 500 for i in ids)
            assert len(set(ids)) == 20  # no duplicate hits

    @pytest.mark.slow  # >15s on the CPU backend
    def test_packing_covers_every_vector_once(self):
        corpus = clustered_corpus(n=700)
        ivf = self._build(corpus, nlist=8)
        codes, ids_map, sizes = ivf._build()
        sizes = np.asarray(sizes)
        assert sizes.sum() == 700
        rows = np.concatenate([np.asarray(ids_map)[li, :sizes[li]]
                               for li in range(8)])
        assert sorted(rows.tolist()) == list(range(700))

    def test_serialize_roundtrip(self, tmp_path):
        corpus = clustered_corpus(n=600)
        ivf = self._build(corpus, nlist=8, nprobe=8)
        before = ivf.search_knn(corpus[:4], 5)
        ivf.serialize(str(tmp_path))
        ivf2 = IVFPQIndex(64, 16, 8, nlist=8, nprobe=8)
        ivf2.deserialize_from(str(tmp_path))
        after = ivf2.search_knn(corpus[:4], 5)
        for (ai, av), (bi, bv) in zip(before, after):
            assert ai == bi
            np.testing.assert_allclose(av, bv, rtol=1e-5)

    def test_memory_accounting(self):
        corpus = clustered_corpus(n=512)
        ivf = self._build(corpus, nlist=8, m=16)
        mem = ivf.memory_bytes()
        codes, ids_map, _ = ivf._build()
        expect = (codes.size + ids_map.size * 4
                  + ivf.centroids.size * 4 + ivf.codebooks.size * 4)
        assert mem == expect
        # codes far below the flat index's raw vectors (512*64*4 B)
        assert codes.size < 512 * 64 * 4
