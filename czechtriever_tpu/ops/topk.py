"""Exact MIPS top-k engines (the FAISS ``IndexFlatIP.search`` replacement,
/root/reference/src/index.py:21,42).

Two interchangeable exact engines, both avoiding the [Q, N] score
materialization that a naive ``q @ C.T`` + ``top_k`` would produce:

  * ``blocked_topk`` — ``lax.scan`` over corpus blocks; each step does
    one MXU matmul [Q,D]x[D,B] and folds the block into a running top-k
    with ``lax.top_k`` on [Q, k+B]. Pure XLA; works on any backend;
    shard_map-able over a corpus-sharded mesh axis.
  * ``pallas_topk`` — single fused Pallas kernel: corpus tiles stream
    HBM->VMEM through the pallas pipeline (double-buffered), scores hit
    the MXU, and a bitonic selection network (ops/bitonic.py — Mosaic has
    no top_k/sort primitive) maintains the running top-k in VMEM scratch.
    No intermediate scores ever touch HBM, so small-Q query latency is
    corpus-bandwidth-bound — the speed-of-light for flat search.

Both return (values [Q,k] f32 sorted desc, indices [Q,k] i32) and give
identical results on distinct scores (tie order may differ).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from czechtriever_tpu.ops import bitonic

NEG_INF = float("-inf")  # plain python float: jnp scalars become captured
                         # constants inside pallas kernels


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _pad_corpus(corpus: jnp.ndarray, block: int) -> jnp.ndarray:
    n = corpus.shape[0]
    pad = (-n) % block
    if pad:
        corpus = jnp.concatenate(
            [corpus, jnp.zeros((pad, corpus.shape[1]), corpus.dtype)], axis=0)
    return corpus


# ---------------------------------------------------------------------------
# XLA blocked scan engine
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "block_size"))
def blocked_topk(queries: jnp.ndarray, corpus: jnp.ndarray, k: int,
                 block_size: int = 4096, n_valid=None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact inner-product top-k: queries [Q,D], corpus [N,D] ->
    (scores [Q,k], indices [Q,k]), sorted descending.

    ``n_valid`` (traced scalar, default N) masks trailing corpus rows —
    used by sharded search where per-device valid counts differ."""
    Q, D = queries.shape
    N = corpus.shape[0]
    if n_valid is None:
        n_valid = N
    k = min(k, N)
    block_size = min(block_size, _next_pow2(N))
    corpus_p = _pad_corpus(corpus, block_size)
    n_blocks = corpus_p.shape[0] // block_size
    blocks = corpus_p.reshape(n_blocks, block_size, D)

    q32 = queries.astype(jnp.float32)

    def body(carry, xs):
        run_v, run_i = carry
        blk, b = xs
        scores = jnp.dot(q32, blk.astype(jnp.float32).T,
                         preferred_element_type=jnp.float32)
        idx = b * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (Q, block_size), 1)
        scores = jnp.where(idx < n_valid, scores, NEG_INF)
        cat_v = jnp.concatenate([run_v, scores], axis=1)
        cat_i = jnp.concatenate([run_i, idx], axis=1)
        v, sel = jax.lax.top_k(cat_v, k)
        i = jnp.take_along_axis(cat_i, sel, axis=1)
        return (v, i), None

    init = (jnp.full((Q, k), NEG_INF), jnp.zeros((Q, k), jnp.int32))
    (v, i), _ = jax.lax.scan(body, init,
                             (blocks, jnp.arange(n_blocks, dtype=jnp.int32)))
    return v, i


# ---------------------------------------------------------------------------
# Fused Pallas engine
# ---------------------------------------------------------------------------

def _topk_kernel(nv_ref, q_ref, c_ref, idx0_ref, out_v_ref, out_i_ref,
                 run_v, run_i, *, block_size: int, k_pad: int, precision):
    b = pl.program_id(1)
    n_b = pl.num_programs(1)
    Q = q_ref.shape[0]

    @pl.when(b == 0)
    def _():
        run_v[:] = jnp.full((Q, k_pad), NEG_INF)
        run_i[:] = jnp.zeros((Q, k_pad), jnp.int32)

    # f32 inputs: Precision.HIGHEST — the MXU's default single-pass bf16
    # rounding perturbs scores in the 4th digit, which flips near-tied
    # ranks vs the f32 XLA path; HIGHEST uses multi-pass f32-accurate
    # matmul. bf16 inputs: DEFAULT — bf16xbf16 products into the f32
    # accumulator are already exact, and Mosaic rejects mixed f32xbf16
    # operands, so the bf16 corpus path feeds bf16 queries too.
    scores = jax.lax.dot_general(
        q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)
    # tile indices come from an *input* iota block: combining an in-kernel
    # tpu.iota with the index sorting network crashes Mosaic's layout
    # inference for >8 query rows (array.h Check failure).
    idx = b * block_size + idx0_ref[:]
    scores = jnp.where(idx < nv_ref[0], scores, NEG_INF)

    # tile top-k_pad via bitonic network, then sorted merge with running
    tile_v, tile_i = bitonic.topk_desc(scores, idx, k_pad)
    cat_v = jnp.concatenate([run_v[:], tile_v], axis=1)
    cat_i = jnp.concatenate([run_i[:], tile_i], axis=1)
    mv, mi = bitonic.topk_desc(cat_v, cat_i, k_pad)
    run_v[:] = mv
    run_i[:] = mi

    @pl.when(b == n_b - 1)
    def _():
        out_v_ref[:] = run_v[:]
        out_i_ref[:] = run_i[:]


@functools.partial(jax.jit, static_argnames=("k", "block_size", "q_tile",
                                             "interpret"))
def pallas_topk(queries: jnp.ndarray, corpus: jnp.ndarray, k: int,
                block_size: int = 1024, q_tile: int = 32,
                interpret: bool = False, n_valid=None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused streaming score+top-k kernel. Same contract as blocked_topk.

    Queries are processed in tiles of ``q_tile`` rows (second grid dim):
    keeps VMEM pressure bounded for large Q while the corpus streams once
    per query tile.
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    k = min(k, N)
    block_size = min(block_size, _next_pow2(N))
    k_pad = min(_next_pow2(k), block_size)
    corpus_p = _pad_corpus(corpus, block_size)
    n_blocks = corpus_p.shape[0] // block_size

    q_pad = (-Q) % q_tile
    # match query dtype to the corpus: a bf16 corpus (the HBM-capacity
    # mode) gets bf16 queries + DEFAULT precision (exact on the MXU),
    # an f32 corpus gets f32 queries + HIGHEST (see kernel comment)
    q_dtype = jnp.bfloat16 if corpus.dtype == jnp.bfloat16 else jnp.float32
    queries_p = queries.astype(q_dtype)
    if q_pad:
        queries_p = jnp.concatenate(
            [queries_p, jnp.zeros((q_pad, D), queries_p.dtype)], axis=0)
    Qp = queries_p.shape[0]
    n_qtiles = Qp // q_tile

    if n_valid is None:
        n_valid = N
    precision = (jax.lax.Precision.DEFAULT if q_dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    kernel = functools.partial(_topk_kernel, block_size=block_size,
                               k_pad=k_pad, precision=precision)
    v, i = pl.pallas_call(
        kernel,
        grid=(n_qtiles, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((q_tile, D), lambda qt, b: (qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_size, D), lambda qt, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, block_size), lambda qt, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_tile, k_pad), lambda qt, b: (qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, k_pad), lambda qt, b: (qt, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((Qp, k_pad), jnp.float32),
                   jax.ShapeDtypeStruct((Qp, k_pad), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((q_tile, k_pad), jnp.float32),
                        pltpu.VMEM((q_tile, k_pad), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * D * corpus_p.shape[0],
            bytes_accessed=n_qtiles * corpus_p.size * corpus_p.dtype.itemsize
            + queries_p.size * queries_p.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32).reshape(1), queries_p, corpus_p,
      jnp.broadcast_to(jnp.arange(block_size, dtype=jnp.int32),
                       (q_tile, block_size)))
    return v[:Q, :k], i[:Q, :k]
