"""Fused FFN-block kernel tests (ops/ffn_block.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from czechtriever_tpu.ops import ffn_block as FB


def composed_reference(x, w1, b1, w2, b2, scale, ln_bias, eps, tanh):
    pre = x.astype(jnp.float32) @ w1.astype(jnp.float32) + b1
    a = jax.nn.gelu(pre.astype(x.dtype).astype(jnp.float32),
                    approximate=tanh)
    out = a.astype(x.dtype).astype(jnp.float32) @ w2.astype(jnp.float32) + b2
    z = x.astype(jnp.float32) + out
    mean = z.mean(-1, keepdims=True)
    zc = z - mean
    rstd = jax.lax.rsqrt((zc * zc).mean(-1, keepdims=True) + eps)
    return (zc * rstd) * scale + ln_bias


def make_inputs(rng, B, L, D, F):
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(D, F)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(F,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, D)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(D,)), jnp.float32)
    ln_bias = jnp.asarray(0.1 * rng.normal(size=(D,)), jnp.float32)
    return x, w1, b1, w2, b2, scale, ln_bias


class TestGeluGrad:
    @pytest.mark.parametrize("tanh", [True, False])
    def test_matches_jax_autodiff(self, tanh):
        x = jnp.linspace(-4.0, 4.0, 101)
        ref = jax.vmap(jax.grad(
            lambda v: jax.nn.gelu(v, approximate=tanh)))(x)
        out = FB._gelu_grad(x, tanh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestInterpret:
    @pytest.mark.parametrize("tanh", [True, False])
    def test_forward_matches_composed(self, tanh):
        rng = np.random.default_rng(0)
        args = make_inputs(rng, 2, 64, 32, 128)
        ref = composed_reference(*args, 1e-12, tanh)
        out = FB.ffn_block_interpret(*args, jnp.int32(0), 0.0, 1e-12,
                                     tanh, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4)

    def test_batch_grouping_invariant(self, monkeypatch):
        """The rows-per-program batch grouping (G elements flattened to
        one [G*L_pad, D] matrix per program) must not change forward
        numerics: every op in the block is row-local."""
        rng = np.random.default_rng(3)
        args = make_inputs(rng, 8, 24, 32, 128)
        monkeypatch.setattr(FB, "_ROWS_TARGET", 0)   # force G=1
        assert FB._pick_group(8, 24) == 1
        ref = FB.ffn_block_interpret(*args, jnp.int32(0), 0.0, 1e-12,
                                     True, True)
        monkeypatch.setattr(FB, "_ROWS_TARGET", 1024)
        assert FB._pick_group(8, 24) == 8
        out = FB.ffn_block_interpret(*args, jnp.int32(0), 0.0, 1e-12,
                                     True, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled Pallas kernels need the real chip")
class TestOnChip:
    def test_forward_matches_composed_f32(self):
        rng = np.random.default_rng(1)
        args = make_inputs(rng, 2, 128, 128, 512)
        ref = composed_reference(*args, 1e-12, True)
        out = jax.jit(functools.partial(FB.ffn_block, tanh_gelu=True))(
            *args, jnp.int32(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-3, atol=3e-3)

    def test_vjp_matches_composed(self):
        rng = np.random.default_rng(2)
        args = make_inputs(rng, 2, 128, 128, 512)

        def loss_block(*a):
            return (FB.ffn_block(*a, jnp.int32(0)).astype(jnp.float32)
                    ** 2).sum()

        def loss_ref(*a):
            return (composed_reference(*a, 1e-12, True) ** 2).sum()

        argnums = tuple(range(7))
        gb = jax.jit(jax.grad(loss_block, argnums=argnums))(*args)
        gn = jax.jit(jax.grad(loss_ref, argnums=argnums))(*args)
        for a, b in zip(gb, gn):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-2, atol=3e-2)

    def test_save_pre_modes_bitwise_equal(self, monkeypatch):
        """CZT_FFN_SAVE_PRE=0 recomputes x@W1+b1 in the backward kernel;
        the recompute rounds through bf16 exactly like the forward's
        store (N-dim tiling never reorders a contraction), so grads must
        be BITWISE equal to the save-the-residual mode."""
        rng = np.random.default_rng(4)
        args = make_inputs(rng, 2, 128, 128, 512)
        argnums = tuple(range(7))

        def loss_block(*a):
            return (FB.ffn_block(*a, jnp.int32(0)).astype(jnp.float32)
                    ** 2).sum()

        monkeypatch.setattr(FB, "_SAVE_PRE", 1)
        g_save = jax.jit(jax.grad(loss_block, argnums=argnums))(*args)
        monkeypatch.setattr(FB, "_SAVE_PRE", 0)
        g_rec = jax.jit(jax.grad(loss_block, argnums=argnums))(*args)
        for a, b in zip(g_save, g_rec):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
