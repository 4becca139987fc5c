"""Fused LayerNorm kernel tests: interpret-mode forward on CPU,
compiled forward + gradient parity and timing on the chip (-m tpu)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from czechtriever_tpu.models.bert import _layer_norm
from czechtriever_tpu.ops import layernorm as LN


def data(n=300, d=768, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)) + rng.normal(size=(1, d)),
                    dtype)
    scale = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    return x, scale, bias


class TestInterpret:
    @pytest.mark.parametrize("n", [256, 300, 17])  # incl. non-block rows
    def test_forward_matches_xla(self, n):
        x, scale, bias = data(n=n, dtype=jnp.float32)
        ref = _layer_norm(x, scale, bias, 1e-12, impl="xla")
        out = LN.fused_layer_norm_interpret(x, scale, bias, 1e-12)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled Pallas kernels need the real chip")
class TestOnChip:
    def test_forward_matches_xla(self):
        x, scale, bias = data(n=8192)
        ref = np.asarray(_layer_norm(x, scale, bias, 1e-12, impl="xla")
                         ).astype(np.float32)
        out = np.asarray(jax.jit(LN.fused_layer_norm)(x, scale, bias)
                         ).astype(np.float32)
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)

    def test_grads_match_xla_autodiff(self):
        x, scale, bias = data(n=2048, dtype=jnp.float32)
        c = jnp.asarray(np.random.default_rng(1).normal(
            size=x.shape), jnp.float32)

        def loss_fused(x, s, b):
            return (LN.fused_layer_norm(x, s, b, 1e-12) * c).sum()

        def loss_xla(x, s, b):
            return (_layer_norm(x, s, b, 1e-12, impl="xla")
                    .astype(jnp.float32) * c).sum()

        gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x, scale, bias)
        gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(x, scale, bias)
        for a, b in zip(gf, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)

    def test_timing_vs_xla(self):
        import time
        x, scale, bias = data(n=32768)

        def bench(fn):
            f = jax.jit(jax.grad(
                lambda x: fn(x).astype(jnp.float32).sum()))
            g = f(x)
            float(jnp.asarray(g).ravel()[0])
            t0 = time.perf_counter()
            for _ in range(20):
                g = f(x)
            float(jnp.asarray(g).ravel()[0])
            return (time.perf_counter() - t0) / 20

        tf = bench(lambda x: LN.fused_layer_norm(x, scale, bias, 1e-12))
        tx = bench(lambda x: _layer_norm(x, scale, bias, 1e-12,
                                         impl="xla"))
        print(f"\nfused LN fwd+bwd {tf*1000:.2f} ms vs xla {tx*1000:.2f} "
              f"ms at [32768, 768]")
        assert tf > 0 and tx > 0
