"""Contriever-style sentence encoder = BERT + masked pooling (+ optional L2).

TPU-native equivalent of /root/reference/src/contriever.py:11-55: the
forward returns a pooled sentence embedding; pad positions are zero-filled
before mean pooling; CLS pooling takes the first token; ``normalize``
L2-normalizes the embedding.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from czechtriever_tpu.models import bert
from czechtriever_tpu.ops import pooling


@partial(jax.jit, static_argnames=("cfg", "pooling_mode", "normalize",
                                   "deterministic", "remat"))
def encode(params: bert.Params, cfg: bert.BertConfig,
           input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
           token_type_ids: Optional[jnp.ndarray] = None,
           dropout_rng: Optional[jax.Array] = None,
           pooling_mode: str = "average", normalize: bool = False,
           deterministic: bool = True, remat: bool = False) -> jnp.ndarray:
    """Token ids -> [B, D] sentence embeddings (float32)."""
    last_hidden = bert.forward(
        params, cfg, input_ids, attention_mask, token_type_ids,
        dropout_rng=dropout_rng, deterministic=deterministic, remat=remat)
    return pooling.pool(last_hidden, attention_mask,
                        pooling=pooling_mode, normalize=normalize)


@partial(jax.jit, static_argnames=("cfg", "num_segments", "normalize",
                                   "deterministic", "remat"))
def encode_packed(params: bert.Params, cfg: bert.BertConfig,
                  input_ids: jnp.ndarray, seg_ids: jnp.ndarray,
                  pos_ids: jnp.ndarray, num_segments: int,
                  dropout_rng: Optional[jax.Array] = None,
                  normalize: bool = False, deterministic: bool = True,
                  remat: bool = False) -> jnp.ndarray:
    """Length-packed encode: [Bp, R] packed layout (data/packing.py) ->
    [num_segments, D] f32 mean-pooled crop embeddings. Same masked-mean
    semantics as ``encode(pooling_mode='average')`` on the unpacked
    batch — the packed pipeline changes only which rows the encoder
    spends FLOPs on, not the embeddings (dropout-0 parity is pinned in
    tests/test_packing.py)."""
    last_hidden = bert.forward_packed(
        params, cfg, input_ids, seg_ids, pos_ids,
        dropout_rng=dropout_rng, deterministic=deterministic, remat=remat)
    emb = pooling.segment_mean_pool(last_hidden, seg_ids, num_segments)
    if normalize:
        emb = pooling.l2_normalize(emb)
    return emb
