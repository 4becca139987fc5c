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

    def test_effective_nprobe_rule(self):
        """Adaptive nprobe (opt-in): union targets nlist//8 lists —
        Q=1 probes the whole target, big batches fall back to the
        configured nprobe; nlist caps everything."""
        idx = IVFPQIndex(64, 16, 8, nlist=1024, nprobe=8,
                         adaptive_nprobe=True)
        assert idx._effective_nprobe(1) == 128    # 1024//8
        assert idx._effective_nprobe(8) == 16
        assert idx._effective_nprobe(16) == 8     # floor = nprobe
        assert idx._effective_nprobe(256) == 8
        idx.target_probe_lists = 4096
        assert idx._effective_nprobe(1) == 1024   # capped at nlist
        idx.adaptive_nprobe = False
        assert idx._effective_nprobe(1) == 8

    def test_adaptive_small_q_recall_beats_fixed(self):
        """Mechanism test for the opt-in adaptive probe at a genuinely
        STARVED config (nprobe=2 of nlist=64, ~3% of lists): adaptive
        must close (most of) the Q=1 top-10 gap to exhaustive PQ.
        NOTE this is not the production operating point — at np=8 /
        nlist=1024 the round-4 pooled sweep (docs/PERF.md) measures no
        gap at all (round-3's half-recall row was a single-query
        artifact), which is why adaptive_nprobe defaults to False."""
        corpus = clustered_corpus(n=4000)
        rng = np.random.default_rng(5)
        queries = (corpus[::40][:24]
                   + 0.05 * rng.normal(size=(24, 64)).astype(np.float32))
        flat = FlatIndex(64)
        flat.index_data([str(i) for i in range(len(corpus))], corpus)
        truth = [set(ids) for ids, _ in flat.search_knn(queries, 10)]

        def q1_recall(idx):
            r = []
            for qi, q in enumerate(queries):       # one query at a time
                ids, _ = idx.search_knn(q[None, :], 10)[0]
                r.append(len(set(ids) & truth[qi]) / 10)
            return float(np.mean(r))

        fixed = IVFPQIndex(64, 16, 8, nlist=64, nprobe=2, train_iters=10,
                           adaptive_nprobe=False)
        fixed.index_data([str(i) for i in range(len(corpus))], corpus)
        rec_fixed = q1_recall(fixed)

        fixed.adaptive_nprobe = True               # target = 64//8 = 8 lists
        rec_adaptive = q1_recall(fixed)

        pq = PQIndex(64, 16, 8, kmeans_iters=10)
        pq.index_data([str(i) for i in range(len(corpus))], corpus)
        rec_pq = np.mean([len(set(ids) & truth[qi]) / 10 for qi, (ids, _)
                          in enumerate(pq.search_knn(queries, 10))])

        assert rec_adaptive > rec_fixed
        # adaptive Q=1 recall@10 within 10% of exhaustive PQ's
        assert rec_adaptive >= 0.9 * rec_pq, (rec_adaptive, rec_pq)

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

    def test_short_union_truncates_instead_of_fake_hits(self):
        """When the probed union holds fewer real candidates than
        top_docs, the result row is truncated to the real hits —
        never padded with the carry-init (score -inf, id 0) slots
        (FAISS pads with id -1; we truncate)."""
        corpus = clustered_corpus(n=200)
        ivf = self._build(corpus, nlist=8, nprobe=1)
        res = ivf.search_knn(corpus[:3], 150)
        for ids, scores in res:
            assert len(ids) < 150          # union of 1-3 lists < 150
            assert len(ids) == len(scores) > 0
            assert np.isfinite(scores).all()
            assert len(set(ids)) == len(ids)

    @pytest.mark.slow  # >15s on the CPU backend
    def test_packing_covers_every_vector_once(self):
        corpus = clustered_corpus(n=700)
        ivf = self._build(corpus, nlist=8)
        codes, ids_map, home_map, sizes = ivf._build()
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
        codes, ids_map, home_map, _ = ivf._build()
        expect = (codes.size + ids_map.size * 4 + home_map.size * 4
                  + ivf.centroids.size * 4 + ivf.codebooks.size * 4)
        assert mem == expect
        # codes far below the flat index's raw vectors (512*64*4 B)
        assert codes.size < 512 * 64 * 4

    def test_skewed_assignment_memory_bounded(self):
        """One hot centroid (all points near one anchor) must NOT blow
        the packed tensor up to [nlist, ~N, m]: capacity is capped at 4x
        the pigeonhole minimum, overflow spills to neighboring lists,
        every vector stays indexed exactly once, and self-queries still
        find themselves at full probe."""
        rng = np.random.default_rng(0)
        n, d, nlist = 4000, 64, 32
        # 97% of points in one tight cluster, the rest spread out
        hot = rng.normal(size=(1, d)).astype(np.float32)
        corpus = np.where(
            (rng.random(n) < 0.97)[:, None],
            hot + 0.01 * rng.normal(size=(n, d)).astype(np.float32),
            rng.normal(size=(n, d)).astype(np.float32) * 3.0,
        ).astype(np.float32)

        ivf = IVFPQIndex(d, 16, 8, nlist=nlist, nprobe=nlist,
                         train_iters=5)
        ivf.index_data([str(i) for i in range(n)], corpus)
        codes, ids_map, home_map, sizes = ivf._build()
        sizes = np.asarray(sizes)
        C = codes.shape[1]
        # memory bound: capacity at the 4x-pigeonhole cap, far below
        # the max-list dense layout (~n rows per list)
        assert C <= -(-4 * (-(-n // nlist)) // 128) * 128
        assert codes.shape[0] * C <= 5 * n  # total slots stay O(N)
        # every vector indexed exactly once despite spilling
        assert sizes.sum() == n
        rows = np.concatenate([np.asarray(ids_map)[li, :sizes[li]]
                               for li in range(nlist)])
        assert sorted(rows.tolist()) == list(range(n))
        # full-probe search must return the exact-ADC top-k: spilling
        # must lose no item and corrupt no score (scores vs the oracle
        # reconstruction c_home + codebook[code])
        queries = corpus[:8]
        res = ivf.search_knn(queries, 5)
        assign_all = np.concatenate(ivf._assign_chunks)
        codes_all = np.concatenate(ivf._code_chunks)
        cb = np.asarray(ivf.codebooks)
        m = cb.shape[0]
        recon = (np.asarray(ivf.centroids)[assign_all]
                 + cb[np.arange(m)[None, :], codes_all.astype(int)]
                 .reshape(n, d))
        for q, (ids, scores) in zip(queries, res):
            exact = recon @ q
            top_exact = np.sort(exact)[::-1][:5]
            np.testing.assert_allclose(np.asarray(scores), top_exact,
                                       rtol=1e-4, atol=1e-4)

    def test_spill_scores_match_unspilled(self):
        """ADC scores must be identical whether an item sits in its home
        list or was spilled: compare against an index with capacity high
        enough to avoid spilling (same centroids/codebooks, full probe)."""
        rng = np.random.default_rng(1)
        n, d, nlist = 1500, 32, 8
        hot = rng.normal(size=(1, d)).astype(np.float32)
        corpus = np.where(
            (rng.random(n) < 0.9)[:, None],
            hot + 0.02 * rng.normal(size=(n, d)).astype(np.float32),
            rng.normal(size=(n, d)).astype(np.float32) * 2.0,
        ).astype(np.float32)
        queries = corpus[::100]

        ivf = IVFPQIndex(d, 8, 8, nlist=nlist, nprobe=nlist, train_iters=5)
        ivf.index_data([str(i) for i in range(n)], corpus)
        _, _, home_map, sizes = ivf._build()
        spilled = int((np.asarray(home_map)
                       != np.arange(nlist)[:, None]).sum())
        got = {i: dict(zip(*r))
               for i, r in enumerate(ivf.search_knn(queries, 10))}

        # same quantizers, no capacity pressure (monkeypatch percentile
        # cap away by rebuilding with nlist=1 semantics): emulate by
        # directly computing exact ADC scores from the quantizers
        assign = np.concatenate(ivf._assign_chunks)
        codes = np.concatenate(ivf._code_chunks)
        cb = np.asarray(ivf.codebooks)          # [m, ksub, dsub]
        cents = np.asarray(ivf.centroids)
        m, ksub, dsub = cb.shape
        recon = (cents[assign]
                 + cb[np.arange(m)[None, :], codes.astype(int)]
                 .reshape(n, d))
        for qi, q in enumerate(queries):
            exact = recon @ q                   # exact ADC inner product
            for doc_id, score in got[qi].items():
                np.testing.assert_allclose(score, exact[int(doc_id)],
                                           rtol=1e-4, atol=1e-4)
        assert spilled > 0  # the skew actually exercised the spill path


class TestShardedIVF:
    def test_sharded_matches_single_device(self):
        """List-sharded union ADC over the 8-device CPU mesh == the
        single-device engine: same probed lists (coarse probe is
        replicated), same candidate scores, same final ids."""
        from czechtriever_tpu.parallel import mesh as meshlib
        rng = np.random.default_rng(4)
        n, d, m_sub, nlist = 4000, 32, 4, 64
        # clustered corpus so the inverted lists are meaningful
        centers = rng.normal(size=(16, d)).astype(np.float32) * 4
        c = (centers[rng.integers(0, 16, n)]
             + rng.normal(size=(n, d)).astype(np.float32))
        ids = [f"p{i}" for i in range(n)]
        kw = dict(n_bits=8, nlist=nlist, nprobe=8, train_iters=8)
        single = IVFPQIndex(d, m_sub, **kw)
        single.index_data(ids, c)
        mesh = meshlib.make_mesh()  # 8 cpu devices
        shard = IVFPQIndex(d, m_sub, **kw, mesh=mesh)
        shard.index_data(ids, c)
        q = (centers[rng.integers(0, 16, 11)]
             + rng.normal(size=(11, d)).astype(np.float32))
        res_s = single.search_knn(q, 12)
        res_m = shard.search_knn(q, 12)
        for (ids_s, v_s), (ids_m, v_m) in zip(res_s, res_m):
            assert ids_s == ids_m
            np.testing.assert_allclose(v_m, v_s, rtol=1e-5, atol=1e-5)
