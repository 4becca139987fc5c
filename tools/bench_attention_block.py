"""Fused attention-block kernel attribution bench (round-5 ask #2).

Times the fwd (and optionally fwd+bwd) fused attention-block kernel
standalone at the training shape and prints the measured time against
its TWO analytic floors:

  * MXU bound — matmul FLOPs / peak (the roofline's corrected bound);
  * HBM bound — bytes moved / peak bandwidth. The fwd kernel reads
    q,k,v,x (+weights once) and writes y + saved ctx + stats: at
    B=128, L=256, HD=768 bf16 that is ~288 MB per call, which at
    ~819 GB/s costs ~0.35 ms — the same order as the 0.39 ms compute
    bound. A perfectly overlapped kernel runs at max(bounds); an
    IO-additive one at their sum.

The timing-only env knobs (ops/attention_block.py) isolate each
suspect — run the matrix:

    python tools/bench_attention_block.py                 # baseline
    CZT_ATTN_NO_SOFTMAX=1  python tools/bench_attention_block.py
    CZT_ATTN_NO_STATS=1    python tools/bench_attention_block.py
    CZT_ATTN_NO_CTX_SAVE=1 python tools/bench_attention_block.py
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

V5E_PEAK_FLOPS = 197e12
V5E_HBM_BW = 819e9


def timeit(f, *args, iters=50):
    o = f(*args)
    float(jax.tree.leaves(o)[0].astype(jnp.float32).sum())  # tunnel sync
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    float(jax.tree.leaves(o)[0].astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters * 1000


def fwd_bounds(B, L, H, D, dtype_bytes=2):
    HD = H * D
    Lk = -(-L // 128) * 128
    # matmuls: QK^T + PV per head + out-proj
    mm = B * (H * (2 * L * Lk * D * 2) + 2 * L * HD * HD)
    # HBM: read q,k,v,x; write y, ctx; stats negligible; weights once
    io = B * L * HD * dtype_bytes * 6 + HD * HD * dtype_bytes
    return mm / V5E_PEAK_FLOPS * 1e3, io / V5E_HBM_BW * 1e3, io / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--head_dim", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--grad", action="store_true",
                    help="also time fwd+bwd (not valid under the "
                         "timing-only fwd knobs)")
    ap.add_argument("--chain", type=int, default=0,
                    help="N > 1: time a single jit containing N "
                         "data-dependent kernel calls and report the "
                         "MARGINAL per-call time (t_N - t_1)/(N-1) — "
                         "removes the per-dispatch tunnel overhead "
                         "that inflates every standalone timing here "
                         "(the same reason xplane was retired)")
    args = ap.parse_args()

    from czechtriever_tpu.ops import attention_block as AB

    B, L, H, D = args.batch, args.seq, args.heads, args.head_dim
    HD = H * D
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    q, k, v, x = (jnp.asarray(rng.normal(size=(B, L, HD)) * 0.05, dt)
                  for _ in range(4))
    wo = jnp.asarray(rng.normal(size=(HD, HD)) * 0.02, dt)
    bo = jnp.zeros((HD,), dt)
    scale = jnp.ones((HD,), dt)
    lb = jnp.zeros((HD,), dt)
    bias = jnp.zeros((B, L), jnp.float32)

    fwd = jax.jit(lambda q, k, v, x: AB.attention_block(
        q, k, v, x, wo, bo, scale, lb, bias, jnp.int32(0), H))

    knobs = [k for k in ("CZT_ATTN_NO_SOFTMAX", "CZT_ATTN_NO_STATS",
                         "CZT_ATTN_NO_CTX_SAVE", "CZT_ATTN_BLOCK_B")
             if os.environ.get(k)]
    mm_ms, io_ms, io_mb = fwd_bounds(B, L, H, D)
    t_fwd = timeit(fwd, q, k, v, x, iters=args.iters)
    print(f"shape B={B} L={L} H={H} D={D} {args.dtype} "
          f"knobs={knobs or 'none'}")
    print(f"bounds: MXU {mm_ms:.3f} ms  HBM {io_ms:.3f} ms "
          f"({io_mb:.0f} MB)  max {max(mm_ms, io_ms):.3f}  "
          f"sum {mm_ms + io_ms:.3f}")
    print(f"fwd        : {t_fwd:7.3f} ms  "
          f"({100 * max(mm_ms, io_ms) / t_fwd:.0f}% of overlapped bound)")
    if args.chain and args.chain > 1:
        N = args.chain

        def chain(n):
            def f(q, k, v, x):
                y = x
                for _ in range(n):
                    y = AB.attention_block(q, k, v, y, wo, bo, scale,
                                           lb, bias, jnp.int32(0), H)
                return y
            return jax.jit(f)

        t1 = timeit(chain(1), q, k, v, x, iters=args.iters)
        tn = timeit(chain(N), q, k, v, x, iters=max(args.iters // 2, 5))
        print(f"chain: t1={t1:.3f} ms  t{N}={tn:.3f} ms  "
              f"marginal/call={(tn - t1) / (N - 1):.3f} ms  "
              f"(dispatch+fixed ~= {t1 - (tn - t1) / (N - 1):.3f} ms)")
    if args.grad:
        g = jax.jit(jax.grad(lambda q, k, v, x: AB.attention_block(
            q, k, v, x, wo, bo, scale, lb, bias, jnp.int32(0), H)
            .astype(jnp.float32).sum(), argnums=(0, 1, 2, 3)))
        print(f"fwd+grad   : {timeit(g, q, k, v, x, iters=args.iters):7.3f} ms")


if __name__ == "__main__":
    main()
