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
