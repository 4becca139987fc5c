"""Jitted Lloyd's k-means for PQ codebook training.

On-device replacement for the k-means FAISS runs inside
``IndexPQ.train`` (/root/reference/src/index.py:29). Assignment is a
blocked argmin over squared L2 (computed as ||c||^2 - 2 x.c on the MXU);
the update step is a one-hot matmul segment-sum, so both phases are
matmul-shaped and TPU-friendly. Empty clusters keep their previous
centroid (FAISS behaves similarly by splitting large clusters; for PQ
subspaces with 256 centroids the difference is negligible).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("block",))
def assign(data: jnp.ndarray, centroids: jnp.ndarray,
           block: int = 16384) -> jnp.ndarray:
    """data [N, D], centroids [K, D] -> nearest-centroid ids [N] (L2)."""
    N, D = data.shape
    pad = (-N) % block
    data_p = jnp.pad(data, ((0, pad), (0, 0)))
    blocks = data_p.reshape(-1, block, D)
    c_norm = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=1)

    def body(_, blk):
        prod = jnp.dot(blk.astype(jnp.float32), centroids.astype(jnp.float32).T,
                       preferred_element_type=jnp.float32)
        dist = c_norm[None, :] - 2.0 * prod  # ||x||^2 constant per row
        return None, jnp.argmin(dist, axis=1).astype(jnp.int32)

    _, ids = jax.lax.scan(body, None, blocks)
    return ids.reshape(-1)[:N]


@functools.partial(jax.jit, static_argnames=("k",))
def _update(data: jnp.ndarray, ids: jnp.ndarray, centroids: jnp.ndarray,
            k: int) -> jnp.ndarray:
    onehot = jax.nn.one_hot(ids, k, dtype=jnp.float32)         # [N, K]
    sums = jnp.dot(onehot.T, data.astype(jnp.float32),
                   preferred_element_type=jnp.float32)          # [K, D]
    counts = onehot.sum(axis=0)[:, None]                        # [K, 1]
    new = sums / jnp.maximum(counts, 1.0)
    return jnp.where(counts > 0, new, centroids)


@functools.partial(jax.jit, static_argnames=("k",))
def _kmeanspp_init(rng: jax.Array, data: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-means++ seeding: next centroid sampled with prob ∝ squared
    distance to the nearest chosen centroid. Avoids the split/merge local
    optima of uniform seeding."""
    data = data.astype(jnp.float32)
    N = data.shape[0]
    sq = jnp.sum(data ** 2, axis=1)
    first_rng, scan_rng = jax.random.split(rng)
    first = jax.random.randint(first_rng, (), 0, N)

    def d2_to(c):
        return jnp.maximum(
            sq - 2.0 * jnp.dot(data, c, preferred_element_type=jnp.float32)
            + jnp.sum(c ** 2), 0.0)

    def step(carry, r):
        d2 = carry
        probs = d2 / jnp.maximum(d2.sum(), 1e-30)
        nxt = jax.random.choice(r, N, p=probs)
        c = data[nxt]
        return jnp.minimum(d2, d2_to(c)), c

    d2 = d2_to(data[first])
    _, rest = jax.lax.scan(step, d2, jax.random.split(scan_rng, k - 1))
    return jnp.concatenate([data[first][None], rest], axis=0)


def kmeans(rng: jax.Array, data: jnp.ndarray, k: int, iters: int = 25
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (centroids [k, D] f32, assignments [N] i32)."""
    N = data.shape[0]
    if N <= k:
        init_idx = jax.random.choice(rng, N, (k,), replace=True)
        centroids = data[init_idx].astype(jnp.float32)
    else:
        centroids = _kmeanspp_init(rng, data, k)
    for _ in range(iters):
        ids = assign(data, centroids)
        centroids = _update(data, ids, centroids, k)
    return centroids, assign(data, centroids)
