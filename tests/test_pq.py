"""PQ index tests: k-means quality, code round-trips, ADC scoring
against an exact-reconstruction oracle, and recall vs flat search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from czechtriever_tpu.ops import kmeans as kmeans_ops
from czechtriever_tpu.retrieval.pq import PQIndex, adc_search, encode_codes


class TestKMeans:
    def test_recovers_separated_clusters(self):
        rng = np.random.default_rng(0)
        centers = rng.normal(size=(4, 8)) * 10
        data = np.concatenate([c + rng.normal(size=(50, 8)) * 0.1
                               for c in centers])
        cents, ids = kmeans_ops.kmeans(jax.random.key(0),
                                       jnp.asarray(data, jnp.float32), 4, 15)
        # every true cluster maps to exactly one learned centroid
        ids = np.asarray(ids)
        groups = [set(ids[i * 50:(i + 1) * 50]) for i in range(4)]
        assert all(len(g) == 1 for g in groups)
        assert len(set().union(*groups)) == 4

    def test_assign_is_nearest(self):
        rng = np.random.default_rng(1)
        data = rng.normal(size=(300, 16)).astype(np.float32)
        cents = rng.normal(size=(10, 16)).astype(np.float32)
        ids = np.asarray(kmeans_ops.assign(jnp.array(data), jnp.array(cents),
                                           block=128))
        d2 = ((data[:, None, :] - cents[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(ids, d2.argmin(1))


class TestPQ:
    def _index(self, n=2000, d=32, m=4, seed=0):
        rng = np.random.default_rng(seed)
        c = rng.normal(size=(n, d)).astype(np.float32)
        ids = [f"p{i}" for i in range(n)]
        idx = PQIndex(d, m, 8, kmeans_iters=10)
        idx.index_data(ids, c)
        return idx, c, rng

    def test_encode_matches_nearest_centroid(self):
        idx, c, rng = self._index(n=500)
        codes = np.asarray(encode_codes(jnp.array(c), idx.codebooks, 256))
        cbs = np.asarray(idx.codebooks)
        sub = c.reshape(500, 4, 8)
        for j in range(4):
            d2 = ((sub[:, j, :, None] - cbs[j].T[None]) ** 2).sum(1)
            np.testing.assert_array_equal(codes[:, j], d2.argmin(1))

    def test_adc_scores_equal_reconstructed_ip(self):
        """ADC score must equal <q, reconstruction(x)> exactly."""
        idx, c, rng = self._index(n=800)
        q = rng.normal(size=(5, 32)).astype(np.float32)
        res = idx.search_knn(q, 10)
        recon = idx.reconstruct(np.arange(800))
        ref_scores = q @ recon.T
        ref_i = np.argsort(-ref_scores, axis=1)[:, :10]
        for r, (rid, rv) in enumerate(res):
            assert rid == [f"p{j}" for j in ref_i[r]]
            np.testing.assert_allclose(
                rv, np.take_along_axis(ref_scores[r][None], ref_i[r][None], 1)[0],
                rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_recall_vs_flat_on_clustered_data(self):
        """On structured data, PQ top-10 should recover most of the exact
        top-10 (sanity: compression preserves ranking signal)."""
        rng = np.random.default_rng(3)
        base = rng.normal(size=(40, 64)).astype(np.float32)
        c = (base[rng.integers(0, 40, 3000)]
             + 0.3 * rng.normal(size=(3000, 64)).astype(np.float32))
        q = (base[rng.integers(0, 40, 20)]
             + 0.3 * rng.normal(size=(20, 64)).astype(np.float32))
        def recall_at_m(m):
            idx = PQIndex(64, m, 8, kmeans_iters=10)
            idx.index_data([str(i) for i in range(3000)], c)
            res = idx.search_knn(q, 10)
            exact = np.argsort(-(q @ c.T), axis=1)[:, :10]
            return np.mean([len({int(x) for x in rid} & set(exact[r])) / 10
                            for r, (rid, _) in enumerate(res)])

        r16, r32 = recall_at_m(16), recall_at_m(32)
        assert r32 > 0.6, (r16, r32)
        assert r32 > r16, "more subquantizers must not hurt recall"

    def test_train_on_first_batch_only(self):
        idx, c, rng = self._index()
        cb0 = np.asarray(idx.codebooks).copy()
        more = rng.normal(size=(100, 32)).astype(np.float32)
        idx.index_data([f"x{i}" for i in range(100)], more)
        np.testing.assert_array_equal(np.asarray(idx.codebooks), cb0)
        assert idx.ntotal == 2100

    def test_serialize_roundtrip(self, tmp_path):
        idx, c, rng = self._index(n=300)
        q = rng.normal(size=(3, 32)).astype(np.float32)
        idx.serialize(str(tmp_path))
        idx2 = PQIndex(32, 4, 8)
        idx2.deserialize_from(str(tmp_path))
        r1, r2 = idx.search_knn(q, 5), idx2.search_knn(q, 5)
        for a, b in zip(r1, r2):
            assert a[0] == b[0]

    def test_memory_accounting(self):
        idx, _, _ = self._index(n=1000, d=32, m=4)
        assert idx.memory_bytes() == 1000 * 4  # 4 bytes/vec vs 128 flat

    def test_n_valid_masking(self):
        idx, c, rng = self._index(n=100)
        q = rng.normal(size=(2, 32)).astype(np.float32)
        v, i = adc_search(jnp.array(q), idx._build(), idx.codebooks, 5,
                          n_valid=50, block=64)
        assert np.asarray(i).max() < 50


class TestShardedPQ:
    def test_sharded_matches_single_device(self):
        """Row-sharded ADC over the 8-device CPU mesh == the
        single-device scan: identical ids, scores to fp tolerance
        (round-5 ask #3 — the compressed engines must scale past one
        chip like the flat engine does)."""
        from czechtriever_tpu.parallel import mesh as meshlib
        rng = np.random.default_rng(3)
        n, d, m_sub = 3000, 32, 4
        c = rng.normal(size=(n, d)).astype(np.float32)
        ids = [f"p{i}" for i in range(n)]
        single = PQIndex(d, m_sub, 8, kmeans_iters=10)
        single.index_data(ids, c)
        mesh = meshlib.make_mesh()  # 8 cpu devices
        shard = PQIndex(d, m_sub, 8, kmeans_iters=10, mesh=mesh)
        shard.index_data(ids, c)
        q = rng.normal(size=(9, d)).astype(np.float32)
        res_s = single.search_knn(q, 15)
        res_m = shard.search_knn(q, 15)
        for (ids_s, v_s), (ids_m, v_m) in zip(res_s, res_m):
            assert ids_s == ids_m
            np.testing.assert_allclose(v_m, v_s, rtol=1e-5, atol=1e-5)


class TestRefinedIndex:
    def test_refine_recovers_exact_topk(self):
        """PQ top-k is quantization-limited; refining the top-R
        candidates against bf16 originals must recover (near-)exact
        top-k whenever the true neighbors are in the candidate set."""
        from czechtriever_tpu.retrieval.refine import RefinedIndex
        rng = np.random.default_rng(7)
        n, d = 3000, 32
        c = rng.normal(size=(n, d)).astype(np.float32)
        ids = [f"p{i}" for i in range(n)]
        base = PQIndex(d, 4, 8, kmeans_iters=10)
        ref = RefinedIndex(base, refine_factor=40)
        ref.index_data(ids, c)
        q = rng.normal(size=(7, d)).astype(np.float32)
        exact = np.argsort(-(q @ c.T), axis=1)[:, :5]
        res = ref.search_knn(q, 5)
        hits = sum(len(set(rids) & {f"p{j}" for j in exact[r]})
                   for r, (rids, _) in enumerate(res))
        # plain PQ at m=4 on random data gets far fewer than 35/35
        vb, ib = base.search_rows(q, 5)
        base_hits = sum(len(set(ib[r]) & set(exact[r]))
                        for r in range(len(q)))
        assert hits >= 30, (hits, base_hits)
        assert hits > base_hits  # refinement must beat the raw ADC
        # refined scores are exact (bf16-rounded) inner products
        v, i = ref.search_rows(q, 5)
        true = np.take_along_axis(q @ c.T, i, axis=1)
        np.testing.assert_allclose(v, true, rtol=2e-2, atol=2e-2)

    def test_memory_accounting_includes_originals(self):
        from czechtriever_tpu.retrieval.refine import RefinedIndex
        rng = np.random.default_rng(8)
        c = rng.normal(size=(600, 32)).astype(np.float32)
        base = PQIndex(32, 4, 8, kmeans_iters=5)
        ref = RefinedIndex(base, refine_factor=4)
        ref.index_data([str(i) for i in range(600)], c)
        assert ref.memory_bytes() >= base.memory_bytes() + 600 * 32 * 2

    def test_serialize_roundtrip(self, tmp_path):
        from czechtriever_tpu.retrieval.refine import RefinedIndex
        rng = np.random.default_rng(9)
        c = rng.normal(size=(500, 32)).astype(np.float32)
        ref = RefinedIndex(PQIndex(32, 4, 8, kmeans_iters=5),
                           refine_factor=8)
        ref.index_data([str(i) for i in range(500)], c)
        q = rng.normal(size=(3, 32)).astype(np.float32)
        before = ref.search_knn(q, 5)
        ref.serialize(str(tmp_path))
        ref2 = RefinedIndex(PQIndex(32, 4, 8, kmeans_iters=5))
        ref2.deserialize_from(str(tmp_path))
        after = ref2.search_knn(q, 5)
        for (i1, v1), (i2, v2) in zip(before, after):
            assert i1 == i2
            np.testing.assert_allclose(v1, v2, rtol=1e-3)
