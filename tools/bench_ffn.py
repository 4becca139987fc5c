"""Standalone FFN-block kernel microbench (real chip).

Decomposes the fused FFN forward's per-program time to find where the
~31%-of-MXU-peak forward loses vs the ~88%-of-peak backward
(docs/PERF.md op-level profile): run the kernel with pieces disabled
(gelu -> identity, dropout off, LN off, no saved residuals) and with an
F-chunked MXU/VPU-overlap variant.

Usage: python tools/bench_ffn.py [--batch 128] [--seq 136] [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters, sync):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seq", type=int, default=136)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--f", type=int, default=3072)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--dropout", type=float, default=0.1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from czechtriever_tpu.ops import ffn_block

    B, L, D, F = args.batch, args.seq, args.d, args.f
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, L, D)) * 0.1, dt)
    w1 = jnp.asarray(rng.normal(size=(D, F)) * 0.02, dt)
    b1 = jnp.zeros((F,), dt)
    w2 = jnp.asarray(rng.normal(size=(F, D)) * 0.02, dt)
    b2 = jnp.zeros((D,), dt)
    sc = jnp.ones((D,), jnp.float32)
    lb = jnp.zeros((D,), jnp.float32)
    seed = jnp.int32(7)

    def sync(out):
        # tunnel-safe: scalar readback is the only reliable device sync
        leaf = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.sum(leaf[..., 0].astype(jnp.float32)))

    flops = 2 * B * L * (2 * D * F)

    def report(name, dt_s):
        print(f"{name:42s} {dt_s*1e3:7.3f} ms  "
              f"{flops/dt_s/1e12:6.1f} TFLOP/s")

    # full fused forward (training mode, as used in the step)
    fwd = jax.jit(lambda *a: ffn_block._block_call(
        *a, hidden_rate=args.dropout, eps=1e-12, tanh_gelu=True,
        deterministic=False)[0])
    report("fused fwd (train: gelu+drop+LN+saves)",
           timed(fwd, (x, w1, b1, w2, b2, sc, lb, seed), args.iters, sync))

    # eval mode: no dropout
    fwd_ev = jax.jit(lambda *a: ffn_block._block_call(
        *a, hidden_rate=0.0, eps=1e-12, tanh_gelu=True,
        deterministic=True)[0])
    report("fused fwd (no dropout)",
           timed(fwd_ev, (x, w1, b1, w2, b2, sc, lb, seed), args.iters,
                 sync))

    # gelu -> identity (isolates the VPU transcendental cost)
    orig_gelu = ffn_block._gelu
    ffn_block._gelu = lambda v, tanh: v
    fwd_id = jax.jit(lambda *a: ffn_block._block_call(
        *a, hidden_rate=args.dropout, eps=1e-12, tanh_gelu=True,
        deterministic=False)[0])
    report("fused fwd (gelu=identity)",
           timed(fwd_id, (x, w1, b1, w2, b2, sc, lb, seed), args.iters,
                 sync))
    ffn_block._gelu = orig_gelu

    # backward for comparison (4 matmuls, ~2x flops)
    def loss(xx, ww1, bb1, ww2, bb2, ss, ll):
        y = ffn_block.ffn_block(xx, ww1, bb1, ww2, bb2, ss, ll, seed,
                                args.dropout, 1e-12, True, False)
        return jnp.sum(y.astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))

    def sync_g(out):
        float(jnp.sum(out[0][..., 0].astype(jnp.float32)))

    outg = g(x, w1, b1, w2, b2, sc, lb)
    sync_g(outg)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        outg = g(x, w1, b1, w2, b2, sc, lb)
    sync_g(outg)
    tot = (time.perf_counter() - t0) / args.iters
    print(f"{'fwd+bwd (grad x,w1)':42s} {tot*1e3:7.3f} ms  "
          f"{3*flops/tot/1e12:6.1f} TFLOP/s(combined)")

    # XLA reference chain for the same math
    def xla_chain(xx, ww1, bb1, ww2, bb2, ss, ll):
        pre = jnp.dot(xx, ww1, preferred_element_type=jnp.float32) \
            + bb1.astype(jnp.float32)
        a = jax.nn.gelu(pre.astype(dt).astype(jnp.float32),
                        approximate=True).astype(dt)
        out = jnp.dot(a, ww2, preferred_element_type=jnp.float32) \
            + bb2.astype(jnp.float32)
        z = xx.astype(jnp.float32) + out
        mu = jnp.mean(z, axis=-1, keepdims=True)
        zc = z - mu
        var = jnp.mean(zc * zc, axis=-1, keepdims=True)
        return ((zc * jax.lax.rsqrt(var + 1e-12)) * ss + ll).astype(dt)

    xf = jax.jit(xla_chain)
    report("XLA chain fwd (no dropout)",
           timed(xf, (x, w1, b1, w2, b2, sc, lb), args.iters, sync))


if __name__ == "__main__":
    main()
