"""Sentence-embedding pooling ops.

Pure jax functions implementing the pooling semantics of the reference
encoder forward (/root/reference/src/contriever.py:45-55 and
src/utils.py:19-22): pad positions are zeroed before mean pooling, and the
mean divides by the *mask* sum (not the sequence length).
"""

from __future__ import annotations

import jax.numpy as jnp


def mask_fill(last_hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out embeddings at pad positions. mask: [B, L] (1 = real token)."""
    return jnp.where(mask[..., None].astype(bool), last_hidden, 0.0)


def mean_pool(last_hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean pooling (src/contriever.py:48-49).

    last_hidden: [B, L, D]; mask: [B, L]. Returns [B, D] in float32 —
    the reduction is done in f32 regardless of compute dtype so that
    bf16 encoders still produce stable embeddings.
    """
    h = mask_fill(last_hidden, mask).astype(jnp.float32)
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0)
    return h.sum(axis=1) / denom


def cls_pool(last_hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """CLS (first-token) pooling (src/contriever.py:50-51)."""
    del mask
    return last_hidden[:, 0].astype(jnp.float32)


def last_token_pool(last_hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Last *real* token pooling, the distillation teacher's pooling
    (/root/reference/distill.py:57-66). The reference special-cases left
    padding; indexing by the last mask=1 position covers both paddings
    with static shapes."""
    # int32 BEFORE the -1: uint8/uint16 wire masks sum to an unsigned
    # dtype, where an all-pad row's 0-1 wraps to 2^32-1 and the maximum
    # no longer clamps
    idx = jnp.maximum(mask.astype(jnp.int32).sum(axis=1) - 1, 0)  # [B]
    return jnp.take_along_axis(
        last_hidden, idx[:, None, None], axis=1
    )[:, 0].astype(jnp.float32)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize parity (src/contriever.py:53-54):
    x / max(||x||_2, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def segment_mean_pool(last_hidden: jnp.ndarray, seg_ids: jnp.ndarray,
                      num_segments: int) -> jnp.ndarray:
    """Masked mean pooling over a length-packed layout.

    last_hidden: [Bp, R, D] from bert.forward_packed; seg_ids: [Bp, R]
    global crop ids (-1 = padding). Returns [num_segments, D] f32 —
    numerically the same masked mean as ``mean_pool`` on the unpacked
    layout (padding rows carry id -1, so their one-hot row is zero and
    they contribute neither to sums nor counts). Implemented as one
    one-hot matmul so the reduction rides the MXU instead of a scatter;
    at recipe shapes the [N, Bp*R] one-hot is ~2 GFLOP against a
    ~3.7 TFLOP encoder forward."""
    D = last_hidden.shape[-1]
    h = last_hidden.reshape(-1, D).astype(jnp.float32)      # [Bp*R, D]
    seg = seg_ids.reshape(-1)                               # [Bp*R]
    oh = (seg[None, :] == jnp.arange(num_segments)[:, None]
          ).astype(jnp.float32)                             # [N, Bp*R]
    sums = jnp.dot(oh, h, preferred_element_type=jnp.float32)
    counts = jnp.sum(oh, axis=1, keepdims=True)
    return sums / jnp.maximum(counts, 1.0)


def pool(last_hidden: jnp.ndarray, mask: jnp.ndarray, pooling: str = "average",
         normalize: bool = False) -> jnp.ndarray:
    if pooling == "average":
        emb = mean_pool(last_hidden, mask)
    elif pooling == "cls":
        emb = cls_pool(last_hidden, mask)
    elif pooling == "last":
        emb = last_token_pool(last_hidden, mask)
    else:
        raise ValueError(f"unknown pooling: {pooling}")
    if normalize:
        emb = l2_normalize(emb)
    return emb
