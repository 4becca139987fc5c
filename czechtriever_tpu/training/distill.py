"""Jitted distillation train step (teacher -> MoCo student).

TPU-native rewrite of the reference distillation topology
(/root/reference/distill.py). The reference dedicates rank 0 to a frozen
fp16 teacher that services students over NCCL point-to-point
(gather queries :262-263, teacher fwd + last-token pool :395-407,
send embeddings back :410-417). That process topology is a GPU-cluster
workaround, not part of the algorithm; on a TPU mesh the teacher is a
second frozen param tree **time-sliced on the same mesh** inside the same
jitted step — no sends, no barriers, and the teacher forward is sharded
over the data axis like everything else.

Parity-critical math, preserved exactly (per microbatch):
  * student contrastive loss = the MoCo objective (MoCoDistill.forward is
    a near-copy of MoCo.forward, src/moco.py:124-181);
  * teacher embeddings of the queries, last-token pooled, f32
    (distill.py:406-407);
  * aux = MSE( sim(student_q), sim(teacher_q) ) * 100, where sim()
    L2-normalizes rows (distill.py:44-47,273-277,
    DISTILL_LOSS_MULTIPLIER distill.py:30);
  * total = (1 - distill_weight) * contrastive + distill_weight * aux
    (distill.py:283).

One deliberate generalization: the reference computes the sim-matrix MSE
over each student's *local* per-GPU batch (distill.py:270-277); here it is
computed over the global microbatch, which is identical for a single data
shard and a strict superset of the constraint otherwise.

The reference teacher re-tokenizes the decoded query text with its own
tokenizer plus an instruction prompt (distill.py:395-405). That is
supported via optional ``t_tokens``/``t_mask`` entries in the batch
(prepared host-side by ``DistillPairBatcher``); when absent the teacher
consumes the student's query tokens directly (shared-vocab teachers).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from czechtriever_tpu.models import bert, gemma
from czechtriever_tpu.models.contriever import encode
from czechtriever_tpu.ops import losses
from czechtriever_tpu.training.state import DistillState
from czechtriever_tpu.training.steps import (global_norm, _mean_stats,
                                             cast_layer_params)

Batch = Dict[str, jnp.ndarray]
Stats = Dict[str, jnp.ndarray]

DISTILL_LOSS_MULTIPLIER = 100.0  # distill.py:30


def make_distill_step(cfg, mcfg: bert.BertConfig, tcfg,
                      tx, teacher_pooling: str = "last") -> Callable:
    """Build the distill train step:
    (state, batch[A,B,L], rng) -> (state, stats).

    ``tcfg`` selects the teacher family: a ``bert.BertConfig``
    (BERT/XLM-R-geometry teachers) or a ``gemma.GemmaConfig`` — the
    causal-LM architecture of the reference's actual teacher
    ``BAAI/bge-multilingual-gemma2`` (distill.py:504-509)."""
    momentum = cfg.momentum
    w = cfg.distill_weight

    if isinstance(tcfg, gemma.GemmaConfig):
        def teacher_encode(params_t, ids, mask):
            return gemma.encode(params_t, tcfg, ids, mask,
                                pooling_mode=teacher_pooling)
    else:
        def teacher_encode(params_t, ids, mask):
            return encode(params_t, tcfg, ids, mask, deterministic=True,
                          pooling_mode=teacher_pooling)

    def train_step(state: DistillState, batch: Batch,
                   rng: jax.Array) -> Tuple[DistillState, Stats]:
        rng = jax.random.fold_in(rng, state.step)
        A = batch["q_tokens"].shape[0]
        micro_rngs = jax.random.split(rng, A)
        has_teacher_tokens = "t_tokens" in batch
        # differentiate w.r.t. bf16 layer weights (see
        # steps.cast_layer_params); f32 masters stay in the optimizer
        params_qc = cast_layer_params(state.params_q, mcfg.compute_dtype)

        def loss_fn(params_q, k, queue, teacher_q, mb, qr):
            q = encode(params_q, mcfg, mb["q_tokens"], mb["q_mask"],
                       dropout_rng=qr, deterministic=False,
                       normalize=cfg.norm_query, pooling_mode=cfg.pooling,
                       remat=cfg.remat)
            contrastive, stats = losses.moco_loss(
                q, k, queue, cfg.temperature, cfg.label_smoothing)
            if state.init_params is not None:
                contrastive = contrastive + losses.l2_from_init_penalty(
                    params_q, state.init_params, cfg.weight_decay)
            aux = losses.distill_sim_mse(q, teacher_q) * DISTILL_LOSS_MULTIPLIER
            total = (1.0 - w) * contrastive + w * aux
            stats["loss"] = contrastive          # distill.py:287 logs the
            stats["loss_contrastive"] = contrastive  # contrastive part
            stats["distill_loss"] = aux
            return total, stats

        def micro(carry, xs):
            params_k, queue, ptr, grad_sum = carry
            mb, mrng = xs
            qr, kr = jax.random.split(mrng)

            params_k = jax.tree.map(
                lambda pk, pq: pk * momentum + pq * (1.0 - momentum),
                params_k, state.params_q)

            # key-encoder dropout follows moco_train_mode_encoder_k
            # (MoCoDistill shares the dead eval() branch,
            # src/moco.py:145-146; see config.py)
            k = encode(params_k, mcfg, mb["k_tokens"], mb["k_mask"],
                       dropout_rng=kr,
                       deterministic=not bool(
                           getattr(cfg, "moco_train_mode_encoder_k", True)),
                       normalize=cfg.norm_doc, pooling_mode=cfg.pooling,
                       remat=cfg.remat)
            k = jax.lax.stop_gradient(k)

            # teacher forward: frozen, eval-mode, f32 embeddings
            # (distill.py:404-408); time-sliced on the same mesh
            t_ids = mb["t_tokens"] if has_teacher_tokens else mb["q_tokens"]
            t_mask = mb["t_mask"] if has_teacher_tokens else mb["q_mask"]
            teacher_q = teacher_encode(state.params_t, t_ids, t_mask)
            teacher_q = jax.lax.stop_gradient(teacher_q)

            (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params_qc, k, queue, teacher_q, mb, qr)
            grad_sum = jax.tree.map(jnp.add, grad_sum, grads)

            queue, ptr = losses.queue_update(queue, ptr, k)
            return (params_k, queue, ptr, grad_sum), stats

        zero_grads = jax.tree.map(jnp.zeros_like, state.params_q)
        carry = (state.params_k, state.queue, state.queue_ptr, zero_grads)
        mbs = {k: v for k, v in batch.items()}
        (params_k, queue, ptr, grads), stats = jax.lax.scan(
            micro, carry, (mbs, micro_rngs))

        updates, opt_state = tx.update(grads, state.opt_state, state.params_q)
        params_q = optax.apply_updates(state.params_q, updates)
        out_stats = _mean_stats(stats)
        out_stats["grad_norm"] = global_norm(grads)
        if getattr(cfg, "log_param_grad_norms", False):
            from czechtriever_tpu.training.steps import per_param_grad_norms
            out_stats.update(per_param_grad_norms(grads))
        return state.replace(step=state.step + 1, params_q=params_q,
                             params_k=params_k, opt_state=opt_state,
                             queue=queue, queue_ptr=ptr), out_stats

    return train_step
