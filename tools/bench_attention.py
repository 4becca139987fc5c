"""Standalone flash-vs-naive attention timing on the real chip.

Isolates the kernel from the train step: times forward and forward+grad
at the training shapes (B=32, L=256, H=12, D=64, bf16) so kernel
experiments (grid shape, head grouping, dtype changes) can be evaluated
in ~1 min instead of a full bench.py run.

    python tools/bench_attention.py --batch 32
    CZT_ATTN_HEAD_GROUPS=3 python tools/bench_attention.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=50):
    o = f(*args)
    jax.block_until_ready(o)
    # scalar readback is the only reliable sync under the axon tunnel
    float(jax.tree.leaves(o)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    float(jax.tree.leaves(o)[0].sum())
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--head_dim", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from czechtriever_tpu.ops import attention as A

    B, L, H, D = args.batch, args.seq, args.heads, args.head_dim
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, L, H * D)), dt)
               for _ in range(3))
    bias = jnp.zeros((B, L), jnp.float32)

    flash_f = jax.jit(lambda q, k, v: A.flash_attention(
        q, k, v, bias, jnp.int32(0), H))
    flash_g = jax.jit(jax.grad(lambda q, k, v: A.flash_attention(
        q, k, v, bias, jnp.int32(0), H).astype(jnp.float32).sum(),
        argnums=(0, 1, 2)))

    def naive_flat(q, k, v):
        return A.naive_attention_flat(q, k, v, bias, H)

    naive_f = jax.jit(naive_flat)
    naive_g = jax.jit(jax.grad(
        lambda q, k, v: naive_flat(q, k, v).astype(jnp.float32).sum(),
        argnums=(0, 1, 2)))

    it = args.iters
    print(f"shapes B={B} L={L} H={H} D={D} {args.dtype} "
          f"head_groups={os.environ.get('CZT_ATTN_HEAD_GROUPS', 'auto')}")
    print(f"flash fwd      : {timeit(flash_f, q, k, v, iters=it):7.3f} ms")
    print(f"flash fwd+grad : {timeit(flash_g, q, k, v, iters=it):7.3f} ms")
    print(f"naive fwd      : {timeit(naive_f, q, k, v, iters=it):7.3f} ms")
    print(f"naive fwd+grad : {timeit(naive_g, q, k, v, iters=it):7.3f} ms")


if __name__ == "__main__":
    main()
