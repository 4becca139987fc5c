"""Unit tests for pure ops: pooling, losses, schedules.

Oracles are the reference formulas (SURVEY.md §2.1) evaluated with
numpy/torch directly — golden-value tests of the loss/pooling math.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from czechtriever_tpu.ops import losses, pooling, schedules


class TestPooling:
    def test_mean_pool_matches_reference(self):
        # reference: masked_fill then sum / mask.sum (src/contriever.py:46-49)
        rng = np.random.default_rng(0)
        h = rng.normal(size=(4, 7, 16)).astype(np.float32)
        mask = (rng.random((4, 7)) > 0.3).astype(np.int32)
        mask[:, 0] = 1  # at least one token

        th = torch.tensor(h)
        tm = torch.tensor(mask)
        ref = th.masked_fill(~tm[..., None].bool(), 0.0)
        ref = (ref.sum(dim=1) / tm.sum(dim=1)[..., None]).numpy()

        out = np.asarray(pooling.mean_pool(jnp.array(h), jnp.array(mask)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_cls_pool(self):
        h = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
        out = np.asarray(pooling.cls_pool(jnp.array(h), jnp.ones((2, 3))))
        np.testing.assert_array_equal(out, h[:, 0])

    def test_l2_normalize(self):
        x = np.random.default_rng(1).normal(size=(5, 8)).astype(np.float32)
        ref = torch.nn.functional.normalize(torch.tensor(x), dim=-1).numpy()
        out = np.asarray(pooling.l2_normalize(jnp.array(x)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_last_token_pool_uint8_all_pad_row(self):
        """Regression: with the uint8 wire masks, an all-pad row's
        mask.sum()-1 must clamp to position 0, not wrap unsigned to
        2^32-1 (jnp.sum(uint8) promotes to uint32)."""
        h = jnp.asarray(np.random.default_rng(2).normal(size=(2, 4, 8)),
                        jnp.float32)
        mask = jnp.array([[1, 1, 0, 0], [0, 0, 0, 0]], jnp.uint8)
        out = pooling.last_token_pool(h, mask)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(h[0, 1]))
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(h[1, 0]))


class TestCrossEntropy:
    @pytest.mark.parametrize("smoothing", [0.0, 0.1])
    def test_matches_torch(self, smoothing):
        rng = np.random.default_rng(2)
        logits = rng.normal(size=(6, 11)).astype(np.float32) * 3
        labels = rng.integers(0, 11, size=(6,))
        ref = torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.tensor(labels),
            label_smoothing=smoothing).item()
        out = float(losses.cross_entropy(jnp.array(logits),
                                         jnp.array(labels), smoothing))
        assert abs(out - ref) < 1e-5


class TestInBatch:
    def test_matches_reference_formula(self):
        # scores = (q / T) @ k.T, labels = arange (src/inbatch.py:62-75)
        rng = np.random.default_rng(3)
        q = rng.normal(size=(8, 16)).astype(np.float32)
        k = rng.normal(size=(8, 16)).astype(np.float32)
        T = 0.05
        scores = torch.einsum("id,jd->ij", torch.tensor(q) / T, torch.tensor(k))
        ref = torch.nn.functional.cross_entropy(
            scores, torch.arange(8)).item()
        loss, stats = losses.inbatch_loss(jnp.array(q), jnp.array(k), T)
        assert abs(float(loss) - ref) < 1e-4
        # stats parity: stdq is torch.std (ddof=1) mean over dims
        ref_stdq = torch.std(torch.tensor(q), dim=0).mean().item()
        assert abs(float(stats["stdq"]) - ref_stdq) < 1e-5

    def test_matches_sharded_formulation(self):
        """Global-batch formulation == per-rank gather + offset labels."""
        rng = np.random.default_rng(4)
        ws, local_b, d = 4, 2, 8
        q = rng.normal(size=(ws * local_b, d)).astype(np.float32)
        k = rng.normal(size=(ws * local_b, d)).astype(np.float32)
        T = 0.7
        global_loss, _ = losses.inbatch_loss(jnp.array(q), jnp.array(k), T)

        # reference per-rank: each rank computes CE over its local queries
        # against the all-gathered keys, labels offset rank*local_b; DDP
        # averages the per-rank losses (all ranks equal batch).
        per_rank = []
        for r in range(ws):
            ql = torch.tensor(q[r * local_b:(r + 1) * local_b])
            scores = torch.einsum("id,jd->ij", ql / T, torch.tensor(k))
            labels = torch.arange(local_b) + r * local_b
            per_rank.append(torch.nn.functional.cross_entropy(scores, labels).item())
        assert abs(float(global_loss) - np.mean(per_rank)) < 1e-5


class TestMoCo:
    def test_logits_match_reference(self):
        # l_pos = einsum(nc,nc->n), l_neg = q @ queue (src/moco.py:289-294)
        rng = np.random.default_rng(5)
        q = rng.normal(size=(4, 8)).astype(np.float32)
        k = rng.normal(size=(4, 8)).astype(np.float32)
        queue_kd = rng.normal(size=(16, 8)).astype(np.float32)  # ours: [K, D]

        tq, tk = torch.tensor(q), torch.tensor(k)
        t_queue = torch.tensor(queue_kd.T)  # reference layout [D, K]
        l_pos = torch.einsum("nc,nc->n", tq, tk).unsqueeze(-1)
        l_neg = torch.einsum("nc,ck->nk", tq, t_queue)
        ref = torch.cat([l_pos, l_neg], dim=1).numpy()

        out = np.asarray(losses.moco_logits(
            jnp.array(q), jnp.array(k), jnp.array(queue_kd)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_loss_and_label_zero(self):
        rng = np.random.default_rng(6)
        q = rng.normal(size=(4, 8)).astype(np.float32)
        k = rng.normal(size=(4, 8)).astype(np.float32)
        queue = rng.normal(size=(16, 8)).astype(np.float32)
        T, s = 0.05, 0.1
        logits = np.asarray(losses.moco_logits(
            jnp.array(q), jnp.array(k), jnp.array(queue))) / T
        ref = torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.zeros(4, dtype=torch.long),
            label_smoothing=s).item()
        loss, stats = losses.moco_loss(jnp.array(q), jnp.array(k),
                                       jnp.array(queue), T, s)
        assert abs(float(loss) - ref) < 1e-4

    def test_queue_update_ring(self):
        queue = jnp.zeros((8, 4))
        ptr = jnp.int32(0)
        for i in range(5):  # wraps once
            keys = jnp.full((4, 4), float(i + 1))
            queue, ptr = losses.queue_update(queue, ptr, keys)
        # after 5 inserts of batch 4 into size 8: ptr = 20 % 8 = 4
        assert int(ptr) == 4
        np.testing.assert_array_equal(np.asarray(queue[:4]), np.full((4, 4), 5.0))
        np.testing.assert_array_equal(np.asarray(queue[4:]), np.full((4, 4), 4.0))

    def test_no_grad_through_queue_or_keys(self):
        queue = jnp.ones((8, 4))

        def f(q, k):
            loss, _ = losses.moco_loss(q, jax.lax.stop_gradient(k), queue, 1.0)
            return loss

        q = jnp.ones((2, 4))
        k = jnp.ones((2, 4)) * 2
        gq, gk = jax.grad(f, argnums=(0, 1))(q, k)
        assert np.abs(np.asarray(gq)).sum() > 0
        assert np.abs(np.asarray(gk)).sum() == 0

    def test_grad_wrt_q_matches_torch_autograd(self):
        """Differential oracle for dL/dq: the reference detaches only the
        queue (src/moco.py:291), so the InfoNCE repulsion gradient flows
        through the l_neg matmul. (Regression: an earlier version wrapped
        the whole negatives matmul in stop_gradient, silently removing
        the repulsion term from training.)"""
        rng = np.random.default_rng(11)
        q = rng.normal(size=(4, 8)).astype(np.float32)
        k = rng.normal(size=(4, 8)).astype(np.float32)
        queue = rng.normal(size=(16, 8)).astype(np.float32)
        T = 0.05

        tq = torch.tensor(q, requires_grad=True)
        l_pos = torch.einsum("nc,nc->n", tq, torch.tensor(k)).unsqueeze(-1)
        l_neg = torch.einsum("nc,ck->nk", tq, torch.tensor(queue.T))
        logits = torch.cat([l_pos, l_neg], dim=1) / T
        torch.nn.functional.cross_entropy(
            logits, torch.zeros(4, dtype=torch.long)).backward()
        ref = tq.grad.numpy()

        g = jax.grad(lambda q: losses.moco_loss(
            q, jax.lax.stop_gradient(jnp.array(k)), jnp.array(queue),
            T)[0])(jnp.array(q))
        np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-4, atol=1e-5)

    def test_bf16_queue_logits_close_to_f32(self):
        """queue_dtype=bfloat16 (the TPU default) must only perturb the
        negative logits at bf16 rounding scale."""
        rng = np.random.default_rng(12)
        q = rng.normal(size=(4, 32)).astype(np.float32)
        k = rng.normal(size=(4, 32)).astype(np.float32)
        queue = rng.normal(size=(64, 32)).astype(np.float32)
        queue /= np.linalg.norm(queue, axis=1, keepdims=True)
        full = np.asarray(losses.moco_logits(
            jnp.array(q), jnp.array(k), jnp.array(queue)))
        half = np.asarray(losses.moco_logits(
            jnp.array(q), jnp.array(k),
            jnp.array(queue).astype(jnp.bfloat16)))
        assert half.dtype == np.float32
        np.testing.assert_allclose(half, full, rtol=3e-2, atol=3e-2)

    def test_distill_sim_mse(self):
        # oracle = the reference compute_sim_matrix + mse_loss
        # (distill.py:44-47,273-276): embeddings are L2-normalized first
        rng = np.random.default_rng(7)
        s = rng.normal(size=(4, 8)).astype(np.float32)
        t = rng.normal(size=(4, 8)).astype(np.float32)

        def ref_sim(x):
            x = torch.nn.functional.normalize(torch.tensor(x), p=2, dim=1)
            return x @ x.T

        ref = torch.nn.functional.mse_loss(ref_sim(s), ref_sim(t)).item()
        out = float(losses.distill_sim_mse(jnp.array(s), jnp.array(t)))
        assert abs(out - ref) < 1e-5

    def test_distill_sim_mse_unnormalized(self):
        rng = np.random.default_rng(7)
        s = rng.normal(size=(4, 8)).astype(np.float32)
        t = rng.normal(size=(4, 8)).astype(np.float32)
        ref = torch.nn.functional.mse_loss(
            torch.tensor(s) @ torch.tensor(s).T,
            torch.tensor(t) @ torch.tensor(t).T).item()
        out = float(losses.distill_sim_mse(jnp.array(s), jnp.array(t),
                                           normalize=False))
        assert abs(out - ref) < 1e-4


class TestSchedules:
    def _ref_warmup_linear(self, step, warmup, total, ratio):
        # src/utils.py:108-118
        if step < warmup:
            return (1 - ratio) * step / float(max(1, warmup))
        return max(0.0, 1.0 + (ratio - 1) * (step - warmup)
                   / float(max(1.0, total - warmup)))

    def _ref_cosine(self, step, warmup, total, ratio):
        # src/utils.py:130-134 (with math imported)
        if step < warmup:
            return float(step) / warmup
        s = float(step - warmup) / (total - warmup)
        return ratio + (1.0 - ratio) * math.cos(0.5 * math.pi * s)

    def test_warmup_linear(self):
        for ratio in (0.0, 0.1):
            for step in (0, 10, 999, 1000, 5000, 10000, 20000):
                ref = self._ref_warmup_linear(step, 1000, 10000, ratio)
                out = float(schedules.warmup_linear(step, 1000, 10000, ratio))
                assert abs(out - ref) < 1e-6, (step, ratio)

    def test_cosine(self):
        for step in (0, 10, 999, 1000, 5000, 10000):
            ref = self._ref_cosine(step, 1000, 10000, 0.1)
            out = float(schedules.cosine(step, 1000, 10000, 0.1))
            assert abs(out - ref) < 1e-6

    def test_make_schedule(self):
        fn = schedules.make_schedule("linear", 1e-5, 100, 1000, 0.0)
        assert abs(float(fn(100)) - 1e-5) < 1e-12
        assert float(fn(1000)) == 0.0
