"""Bitonic sorting network in pure jnp ops.

Neither ``lax.top_k`` nor ``lax.sort`` lowers inside Pallas TPU kernels
(Mosaic has no primitive for them), so the fused score+top-k retrieval
kernel (ops/topk.py) needs a selection network built from reshapes and
min/max — which the VPU executes as dense vector ops.

The classic bitonic network is expressed here without gathers: a
compare-exchange stage at distance ``j`` is a reshape to
``[..., n/(2j), 2, j]`` and a min/max over the pair axis; the
ascending/descending direction of each block is a broadcasted-iota mask.
Total cost: log2(n)*(log2(n)+1)/2 vectorized passes over the array.

Used both inside pallas_call and as a plain XLA op (it jits fine
anywhere). Requires the sorted axis length to be a power of two — pad
with -inf first.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def _stage(v: jnp.ndarray, i: jnp.ndarray, j: int, k_size: int
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One compare-exchange stage: partners at XOR-distance j, block
    direction set by bit k_size of the position.

    Formulated with rolls + masks rather than reshapes: Mosaic cannot
    lower lane-splitting shape casts ([Q, n] -> [Q, n/2j, 2, j]), but
    lane rotates and selects selectors it handles natively.
    """
    n = v.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    is_first = (pos & j) == 0           # lower element of its pair
    desc = (pos & k_size) == 0          # block sort direction

    # partner value/index: p^j = p+j when bit j clear else p-j
    fwd_v = jnp.roll(v, -j, axis=-1)
    bwd_v = jnp.roll(v, j, axis=-1)
    part_v = jnp.where(is_first, fwd_v, bwd_v)
    fwd_i = jnp.roll(i, -j, axis=-1)
    bwd_i = jnp.roll(i, j, axis=-1)
    part_i = jnp.where(is_first, fwd_i, bwd_i)

    # descending & first  -> keep max;  descending & second -> keep min;
    # ascending flips both. Expressed with bitwise i1 ops: Mosaic cannot
    # lower a select between bool vectors.
    want_max = jnp.logical_not(jnp.logical_xor(desc, is_first))
    take_partner = jnp.logical_or(
        jnp.logical_and(want_max, part_v > v),
        jnp.logical_and(jnp.logical_not(want_max), part_v < v))
    v = jnp.where(take_partner, part_v, v)
    i = jnp.where(take_partner, part_i, i)
    return v, i


def sort_desc(values: jnp.ndarray, indices: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort the last axis descending, carrying indices. Last-axis length
    must be a power of two. Loops are Python-level (static network) so
    this traces to a fixed op sequence."""
    n = values.shape[-1]
    assert _is_pow2(n), f"bitonic length {n} must be a power of 2"
    k_size = 2
    while k_size <= n:
        j = k_size // 2
        while j >= 1:
            values, indices = _stage(values, indices, j, k_size)
            j //= 2
        k_size *= 2
    return values, indices


def topk_desc(values: jnp.ndarray, indices: jnp.ndarray, k: int
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k of the last axis (descending), via full bitonic sort."""
    v, i = sort_desc(values, indices)
    return v[..., :k], i[..., :k]
