"""Train-state pytrees.

Everything the reference keeps as module attributes / registered buffers
(/root/reference/src/moco.py:187-221: encoder_q, encoder_k EMA copy,
queue, queue_ptr) plus optimizer state and step live here as one explicit
pytree — so EMA updates are tree_maps, checkpointing is one orbax save,
and the whole state donates cleanly into the jitted train step.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from czechtriever_tpu.models import bert
from czechtriever_tpu.ops.pooling import l2_normalize


@struct.dataclass
class InBatchState:
    """Single shared encoder (reference InBatch, src/inbatch.py:17-30)."""

    step: jnp.ndarray          # int32 scalar, optimizer steps completed
    params: Any                # encoder params
    opt_state: Any
    init_params: Optional[Any] = None  # for weight_decay_from_init


@struct.dataclass
class MoCoState:
    """MoCo dual encoder + negative queue (src/moco.py:187-224)."""

    step: jnp.ndarray
    params_q: Any
    params_k: Any              # EMA copy, never receives gradients
    opt_state: Any
    queue: jnp.ndarray         # [queue_size, proj_size] ring buffer
    queue_ptr: jnp.ndarray     # int32 scalar
    init_params: Optional[Any] = None


@struct.dataclass
class DistillState:
    """MoCoDistill student + frozen teacher (reference distill.py topology:
    the teacher is rank 0's separate fp16 model, distill.py:504-509; here
    it is a second frozen param tree time-sliced on the same mesh)."""

    step: jnp.ndarray
    params_q: Any
    params_k: Any
    opt_state: Any
    queue: jnp.ndarray
    queue_ptr: jnp.ndarray
    params_t: Any              # teacher params, never updated
    init_params: Optional[Any] = None


def init_queue(rng: jax.Array, queue_size: int, proj_size: int,
               dtype=jnp.float32) -> jnp.ndarray:
    """L2-normalized randn queue init (src/moco.py:218-219; the reference
    normalizes along the feature dim)."""
    q = jax.random.normal(rng, (queue_size, proj_size), jnp.float32)
    return l2_normalize(q, axis=-1).astype(dtype)


def create_inbatch_state(rng: jax.Array, cfg, mcfg: bert.BertConfig, tx,
                         params: Optional[Any] = None) -> InBatchState:
    if params is None:
        params = bert.init_params(rng, mcfg)
    params = jax.tree.map(jnp.asarray, params)
    init_params = (jax.tree.map(jnp.copy, params)
                   if cfg.weight_decay_from_init else None)
    return InBatchState(step=jnp.int32(0), params=params,
                        opt_state=tx.init(params), init_params=init_params)


def create_moco_state(rng: jax.Array, cfg, mcfg: bert.BertConfig, tx,
                      params: Optional[Any] = None) -> MoCoState:
    p_rng, q_rng = jax.random.split(rng)
    if params is None:
        params = bert.init_params(p_rng, mcfg)
    params = jax.tree.map(jnp.asarray, params)
    # encoder_k starts as an exact copy of encoder_q (src/moco.py:211-215)
    params_k = jax.tree.map(jnp.copy, params)
    init_params = (jax.tree.map(jnp.copy, params)
                   if cfg.weight_decay_from_init else None)
    queue_dtype = jnp.dtype(getattr(cfg, "queue_dtype", "float32"))
    if queue_dtype != jnp.float32:
        logging.getLogger(__name__).info(
            "MoCo negative queue stored as %s (reference keeps f32, "
            "src/moco.py:218-221; pass --queue_dtype float32 for strict "
            "parity)", queue_dtype.name)
    return MoCoState(
        step=jnp.int32(0), params_q=params, params_k=params_k,
        opt_state=tx.init(params),
        queue=init_queue(q_rng, cfg.queue_size, cfg.projection_size,
                         dtype=queue_dtype),
        queue_ptr=jnp.int32(0), init_params=init_params)


def create_distill_state(rng: jax.Array, cfg, mcfg: bert.BertConfig,
                         tcfg, tx,
                         params: Optional[Any] = None,
                         teacher_params: Optional[Any] = None) -> DistillState:
    """``tcfg``: bert.BertConfig or gemma.GemmaConfig (the reference
    teacher's decoder-LM family, distill.py:504-509)."""
    p_rng, q_rng, t_rng = jax.random.split(rng, 3)
    moco = create_moco_state(jax.random.fold_in(p_rng, 0), cfg, mcfg, tx,
                             params=params)
    if teacher_params is None:
        from czechtriever_tpu.models import gemma
        init = (gemma.init_params if isinstance(tcfg, gemma.GemmaConfig)
                else bert.init_params)
        teacher_params = init(t_rng, tcfg)
    teacher_params = jax.tree.map(jnp.asarray, teacher_params)
    del q_rng
    return DistillState(
        step=moco.step, params_q=moco.params_q, params_k=moco.params_k,
        opt_state=moco.opt_state, queue=moco.queue,
        queue_ptr=moco.queue_ptr, params_t=teacher_params,
        init_params=moco.init_params)
