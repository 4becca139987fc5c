"""Fused attention-block kernel tests (ops/attention_block.py).

CPU interpret-mode forward vs the composed reference
(naive attention -> out-proj -> residual -> LayerNorm), deterministic.
On-chip compiled + VJP coverage lives under -m tpu."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from czechtriever_tpu.ops import attention_block as AB
from czechtriever_tpu.ops.attention import naive_attention_flat


def composed_reference(q, k, v, x, wo, bo, scale, ln_bias, bias, H, eps):
    ctx = naive_attention_flat(q, k, v, bias, H, deterministic=True)
    attn = ctx.astype(jnp.float32) @ wo.astype(jnp.float32) + bo
    z = x.astype(jnp.float32) + attn
    mean = z.mean(-1, keepdims=True)
    zc = z - mean
    rstd = jax.lax.rsqrt((zc * zc).mean(-1, keepdims=True) + eps)
    return (zc * rstd) * scale + ln_bias


def make_inputs(rng, B, H, L, D):
    HD = H * D
    q, k, v, x = (jnp.asarray(rng.normal(size=(B, L, HD)), jnp.float32)
                  for _ in range(4))
    wo = jnp.asarray(rng.normal(size=(HD, HD)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(HD,)) * 0.1, jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(HD,)), jnp.float32)
    ln_bias = jnp.asarray(0.1 * rng.normal(size=(HD,)), jnp.float32)
    mask = np.ones((B, L), np.int32)
    mask[:, -2:] = 0
    bias = jnp.where(jnp.asarray(mask).astype(bool), 0.0, -1e30
                     ).astype(jnp.float32)
    return q, k, v, x, wo, bo, scale, ln_bias, bias


class TestInterpret:
    @pytest.mark.parametrize("L", [64, 256])
    def test_forward_matches_composed(self, L):
        rng = np.random.default_rng(0)
        args = make_inputs(rng, 2, 3, L, 32)
        ref = composed_reference(*args, 3, 1e-12)
        out = AB.attention_block_interpret(*args, jnp.int32(0), n_heads=3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled Pallas kernels need the real chip")
class TestOnChip:
    def test_forward_matches_composed_bf16_full_shape(self):
        # the training shape in the training dtype. (f32 at HD=768
        # crashes the axon remote-compile helper — an infra limit, so
        # f32 coverage lives at the smaller shape below.)
        rng = np.random.default_rng(1)
        args = make_inputs(rng, 4, 12, 256, 64)
        bf = [a.astype(jnp.bfloat16) if a.ndim == 3 or a.ndim == 2
              else a for a in args[:8]] + [args[8]]
        ref = composed_reference(*args, 12, 1e-12)
        out = jax.jit(functools.partial(AB.attention_block, n_heads=12))(
            *bf, jnp.int32(0))
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32), np.asarray(ref),
            rtol=5e-2, atol=5e-2)

    def test_forward_matches_composed_f32(self):
        rng = np.random.default_rng(4)
        args = make_inputs(rng, 2, 4, 128, 32)
        ref = composed_reference(*args, 4, 1e-12)
        out = jax.jit(functools.partial(AB.attention_block, n_heads=4))(
            *args, jnp.int32(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-3, atol=3e-3)

    def test_vjp_matches_composed(self):
        rng = np.random.default_rng(2)
        args = make_inputs(rng, 2, 4, 128, 32)

        def loss_block(q, k, v, x, wo, bo, scale, ln_bias):
            return (AB.attention_block(q, k, v, x, wo, bo, scale, ln_bias,
                                       args[8], jnp.int32(0), 4)
                    .astype(jnp.float32) ** 2).sum()

        def loss_ref(q, k, v, x, wo, bo, scale, ln_bias):
            return (composed_reference(q, k, v, x, wo, bo, scale, ln_bias,
                                       args[8], 4, 1e-12) ** 2).sum()

        argnums = tuple(range(8))
        gb = jax.jit(jax.grad(loss_block, argnums=argnums))(*args[:8])
        gn = jax.jit(jax.grad(loss_ref, argnums=argnums))(*args[:8])
        for a, b in zip(gb, gn):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-2, atol=3e-2)

    def test_dropout_fwd_bwd_mask_consistency(self):
        """Output is linear in v for fixed masks; the unit difference
        quotient must equal grad wrt v exactly if fwd/bwd regenerate the
        same attention+hidden dropout masks."""
        rng = np.random.default_rng(3)
        q, k, v, x, wo, bo, scale, ln_bias, bias = make_inputs(
            rng, 1, 2, 128, 32)
        c = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

        def f(vx):
            return (AB.attention_block(q, k, vx, x, wo, bo, scale,
                                       ln_bias, bias, jnp.int32(5), 2,
                                       0.2, 0.2, 1e-12, False) * c).sum()

        g = jax.jit(jax.grad(f))(v)
        d = jnp.zeros_like(v).at[0, 7, 33].set(1.0)
        exact = jax.jit(f)(v + d) - jax.jit(f)(v)
        # LN makes it only locally linear in v; allow small curvature
        assert abs(float(exact) - float(g[0, 7, 33])) < 1e-1 * max(
            1.0, abs(float(exact)))


class TestPairPacking:
    """Segmented-bias pair packing (round-4): two batch elements share
    one kernel row-block; the block-diagonal bias must make the packed
    call reproduce the unpacked per-element outputs."""

    def _packed_args(self, rng, B, H, L, D):
        q, k, v, x, wo, bo, scale, ln_bias, bias = make_inputs(
            rng, B, H, L, D)
        HD = H * D
        pk = [t.reshape(B // 2, 2 * L, HD) for t in (q, k, v, x)]
        bias_seg = bias.reshape(B // 2, 2, L)
        return (q, k, v, x, wo, bo, scale, ln_bias, bias), \
            (pk[0], pk[1], pk[2], pk[3], wo, bo, scale, ln_bias, bias_seg)

    def test_interpret_packed_matches_unpacked(self):
        rng = np.random.default_rng(7)
        B, H, L, D = 4, 3, 40, 32      # L % 8 == 0, L % 128 != 0
        unpacked, packed = self._packed_args(rng, B, H, L, D)
        out_u = AB.attention_block_interpret(*unpacked, jnp.int32(0),
                                             n_heads=H)
        out_p = AB.attention_block_interpret(*packed, jnp.int32(0),
                                             n_heads=H)
        np.testing.assert_allclose(
            np.asarray(out_p).reshape(B, L, H * D), np.asarray(out_u),
            rtol=2e-4, atol=2e-4)

    def test_model_forward_packed_matches_unpacked_interpret(
            self, monkeypatch):
        """bert.forward's pack gate (reshape + segmented-bias plumbing)
        exercised end to end on CPU by routing the fused kernel through
        interpret mode: packed flash_block forward == naive forward."""
        from czechtriever_tpu.models import bert

        def interp(q, k, v, x, wo, bo, scale, ln_bias, bias, seed, H,
                   attn_rate=0.0, hidden_rate=0.0, eps=1e-12,
                   deterministic=True):
            return AB.attention_block_interpret(
                q, k, v, x, wo, bo, scale, ln_bias, bias, seed,
                n_heads=H, eps=eps, deterministic=deterministic)

        monkeypatch.setattr(AB, "attention_block", interp)
        rng = np.random.default_rng(12)
        B, L = 4, 40                    # even B, L % 8 == 0, L % 128 != 0
        cfg_p = bert.BertConfig.tiny(attention_impl="flash_block",
                                     attention_pack_pairs=True)
        cfg_n = bert.BertConfig.tiny(attention_impl="naive")
        params = bert.init_params(jax.random.key(3), cfg_n)
        ids = jnp.asarray(rng.integers(5, cfg_n.vocab_size, (B, L)))
        mask = np.ones((B, L), np.int32)
        mask[:, -5:] = 0
        mask = jnp.asarray(mask)
        out_p = bert.forward.__wrapped__(params, cfg_p, ids, mask)
        out_n = bert.forward.__wrapped__(params, cfg_n, ids, mask)
        real = np.asarray(mask).astype(bool)
        np.testing.assert_allclose(np.asarray(out_p)[real],
                                   np.asarray(out_n)[real],
                                   rtol=3e-4, atol=3e-4)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled Pallas kernels need the real chip")
class TestPairPackingOnChip:
    def test_packed_forward_and_grads_match_unpacked(self):
        rng = np.random.default_rng(11)
        B, H, L, D = 4, 4, 136, 32     # the recipe row shape
        q, k, v, x, wo, bo, scale, ln_bias, bias = make_inputs(
            rng, B, H, L, D)
        HD = H * D
        qp, kp, vp, xp = (t.reshape(B // 2, 2 * L, HD)
                          for t in (q, k, v, x))
        bias_seg = bias.reshape(B // 2, 2, L)

        def loss_u(q, k, v, x, wo):
            return (AB.attention_block(q, k, v, x, wo, bo, scale,
                                       ln_bias, bias, jnp.int32(0), H)
                    .astype(jnp.float32) ** 2).sum()

        def loss_p(q, k, v, x, wo):
            return (AB.attention_block(q, k, v, x, wo, bo, scale,
                                       ln_bias, bias_seg, jnp.int32(0), H)
                    .astype(jnp.float32) ** 2).sum()

        out_u = jax.jit(functools.partial(AB.attention_block, n_heads=H))(
            q, k, v, x, wo, bo, scale, ln_bias, bias, jnp.int32(0))
        out_p = jax.jit(functools.partial(AB.attention_block, n_heads=H))(
            qp, kp, vp, xp, wo, bo, scale, ln_bias, bias_seg, jnp.int32(0))
        np.testing.assert_allclose(
            np.asarray(out_p).reshape(B, L, HD), np.asarray(out_u),
            rtol=3e-3, atol=3e-3)

        gu = jax.jit(jax.grad(loss_u, argnums=(0, 1, 2, 3, 4)))(
            q, k, v, x, wo)
        gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3, 4)))(
            qp, kp, vp, xp, wo)
        for a, b in zip(gp[:4], gu[:4]):
            np.testing.assert_allclose(
                np.asarray(a).reshape(B, L, HD), np.asarray(b),
                rtol=3e-2, atol=3e-2)
        np.testing.assert_allclose(np.asarray(gp[4]), np.asarray(gu[4]),
                                   rtol=3e-2, atol=3e-2)

    def test_bert_forward_packed_matches_unpacked(self):
        from czechtriever_tpu.models import bert
        rng = np.random.default_rng(13)
        base = dict(attention_impl="flash_block",
                    hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0)
        cfg_u = bert.BertConfig.tiny(**base)
        cfg_p = bert.BertConfig.tiny(attention_pack_pairs=True, **base)
        params = bert.init_params(jax.random.PRNGKey(0), cfg_u)
        B, L = 4, 40
        ids = jnp.asarray(rng.integers(5, 900, (B, L)), jnp.int32)
        mask = np.ones((B, L), np.int32)
        mask[:, -3:] = 0
        mask = jnp.asarray(mask)
        out_u = jax.jit(lambda p, i, m: bert.forward(p, cfg_u, i, m))(
            params, ids, mask)
        out_p = jax.jit(lambda p, i, m: bert.forward(p, cfg_p, i, m))(
            params, ids, mask)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                                   rtol=3e-3, atol=3e-3)


class TestBlockBatch:
    def test_block_b_is_bitwise_invariant(self, monkeypatch):
        """CZT_ATTN_BLOCK_B regroups grid iterations only: outputs must
        be IDENTICAL (same per-element math, same PRNG seeds)."""
        rng = np.random.default_rng(17)
        args = make_inputs(rng, 4, 3, 40, 32)
        out1 = AB.attention_block_interpret(*args, jnp.int32(0), n_heads=3)
        monkeypatch.setenv("CZT_ATTN_BLOCK_B", "2")
        out2 = AB.attention_block_interpret(*args, jnp.int32(0), n_heads=3)
        monkeypatch.setenv("CZT_ATTN_BLOCK_B", "4")
        out4 = AB.attention_block_interpret(*args, jnp.int32(0), n_heads=3)
        monkeypatch.setenv("CZT_ATTN_BLOCK_B", "3")  # 4 % 3 -> falls to 2
        out3 = AB.attention_block_interpret(*args, jnp.int32(0), n_heads=3)
        assert np.array_equal(np.asarray(out1), np.asarray(out2))
        assert np.array_equal(np.asarray(out1), np.asarray(out4))
        assert np.array_equal(np.asarray(out1), np.asarray(out3))


class TestStagedHeads:
    def test_staged_bitwise_equals_interleaved(self, monkeypatch):
        """CZT_ATTN_STAGED reorders the per-head schedule only; per-head
        math is independent, so outputs must be BITWISE identical."""
        rng = np.random.default_rng(21)
        args = make_inputs(rng, 2, 3, 64, 32)
        base = AB.attention_block_interpret(*args, jnp.int32(0), n_heads=3)
        monkeypatch.setenv("CZT_ATTN_STAGED", "1")
        staged = AB.attention_block_interpret(*args, jnp.int32(0),
                                              n_heads=3)
        np.testing.assert_array_equal(np.asarray(base),
                                      np.asarray(staged))
