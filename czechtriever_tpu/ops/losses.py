"""Contrastive objectives as pure jax functions.

These implement the math of the reference objectives
(/root/reference/src/moco.py:289-330, src/inbatch.py:59-90) in a
TPU/GSPMD-native formulation: losses are written over the *global* batch.
Under pjit with the batch sharded along the mesh "data" axis, XLA inserts
the all-gather/psum collectives that the reference performs by hand with
NCCL (src/dist_utils.py:7-37) — including the differentiable all-gather of
in-batch keys, which falls out of jax AD for free.

All logits math is done in float32 even when embeddings arrive in bf16.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  label_smoothing: float = 0.0) -> jnp.ndarray:
    """Mean CE over the batch with torch-style label smoothing.

    torch.nn.functional.cross_entropy(label_smoothing=s) minimizes
    -( (1-s) * log p[y] + s/C * sum_c log p[c] ).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    n_classes = logits.shape[-1]
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return nll.mean()


def embedding_stats(q: jnp.ndarray, k: jnp.ndarray, logits: jnp.ndarray,
                    labels: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """accuracy / stdq / stdk, matching src/moco.py:345-351.

    torch.std uses the Bessel-corrected (ddof=1) estimator.
    """
    predicted = jnp.argmax(logits, axis=-1)
    accuracy = 100.0 * (predicted == labels).astype(jnp.float32).mean()
    stdq = jnp.std(q.astype(jnp.float32), axis=0, ddof=1).mean()
    stdk = jnp.std(k.astype(jnp.float32), axis=0, ddof=1).mean()
    return {"accuracy": accuracy, "stdq": stdq, "stdk": stdk}


def inbatch_loss(qemb: jnp.ndarray, kemb: jnp.ndarray, temperature: float,
                 label_smoothing: float = 0.0) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Global-batch in-batch InfoNCE (src/inbatch.py:59-90).

    qemb, kemb: [B, D] over the *global* batch. Equivalent to the
    reference's per-rank formulation (all-gather keys, labels offset by
    rank * local_B) because scores over the global batch with labels
    arange(B) contain exactly the same (query, key) pairs.
    """
    scores = jnp.einsum(
        "id,jd->ij", qemb.astype(jnp.float32) / temperature,
        kemb.astype(jnp.float32),
    )
    labels = jnp.arange(qemb.shape[0], dtype=jnp.int32)
    loss = cross_entropy(scores, labels, label_smoothing)
    stats = embedding_stats(qemb, kemb, scores, labels)
    stats["loss"] = loss
    return loss, stats


def moco_logits(q: jnp.ndarray, k: jnp.ndarray, queue: jnp.ndarray) -> jnp.ndarray:
    """[l_pos | l_neg] logits (src/moco.py:289-294).

    q, k: [B, D]; queue: [K, D] (row-major ring buffer — the reference
    stores it transposed as [D, K]; row-major keeps the negative matmul
    q @ queue.T in the MXU-friendly [B,D]x[D,K] layout and makes the
    ring-buffer enqueue a contiguous dynamic_update_slice on rows).
    Returns [B, 1+K] float32. No gradient flows into the queue.
    """
    q32 = q.astype(jnp.float32)
    l_pos = jnp.einsum("nc,nc->n", q32, k.astype(jnp.float32))[:, None]
    # detach the QUEUE only (reference: queue.clone().detach(),
    # src/moco.py:291) — the gradient w.r.t. q through l_neg is the
    # InfoNCE repulsion term and must flow. The negatives matmul runs on
    # the queue's storage dtype with f32 accumulation.
    queue = jax.lax.stop_gradient(queue)
    l_neg = jnp.dot(q.astype(queue.dtype), queue.T,
                    preferred_element_type=jnp.float32
                    ).astype(jnp.float32)
    return jnp.concatenate([l_pos, l_neg], axis=1)


def moco_loss(q: jnp.ndarray, k: jnp.ndarray, queue: jnp.ndarray,
              temperature: float, label_smoothing: float = 0.0
              ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """MoCo InfoNCE against the negative queue (src/moco.py:296-351).

    k must already be stop-gradient'd (key encoder runs under no-grad).
    """
    logits = moco_logits(q, k, queue) / temperature
    labels = jnp.zeros(q.shape[0], dtype=jnp.int32)
    loss = cross_entropy(logits, labels, label_smoothing)
    stats = embedding_stats(q, k, logits, labels)
    stats["loss"] = loss
    return loss, stats


def queue_update(queue: jnp.ndarray, queue_ptr: jnp.ndarray,
                 keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ring-buffer dequeue-and-enqueue (src/moco.py:272-287).

    queue: [K, D]; keys: [B, D] — the *global* batch of keys (under pjit
    the all-gather the reference does by hand happens implicitly; this
    also fixes the reference's world_size-1 gather bug,
    src/dist_utils.py:33, by construction). Requires K % B == 0, the same
    invariant the reference asserts (src/moco.py:279-281), which makes the
    wrap-around case impossible and the write a single contiguous
    dynamic_update_slice.
    """
    K = queue.shape[0]
    B = keys.shape[0]
    assert K % B == 0, f"queue_size {K} must be divisible by global batch {B}"
    keys = jax.lax.stop_gradient(keys).astype(queue.dtype)
    queue = jax.lax.dynamic_update_slice(queue, keys, (queue_ptr, 0))
    queue_ptr = (queue_ptr + B) % K
    return queue, queue_ptr


def l2_from_init_penalty(params, init_params, weight_decay: float) -> jnp.ndarray:
    """Optional L2-distance-from-initialization penalty added to the loss
    (src/moco.py:332-336)."""
    sq = jax.tree.map(lambda p, p0: jnp.sum((p - p0) ** 2), params, init_params)
    return weight_decay * jax.tree.reduce(jnp.add, sq, jnp.float32(0.0))


def sim_matrix(emb: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize then self-similarity (distill.py:44-47
    compute_sim_matrix: F.normalize(emb) @ F.normalize(emb).T)."""
    e = emb.astype(jnp.float32)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
    return jnp.dot(e, e.T, preferred_element_type=jnp.float32)


def distill_sim_mse(student_q: jnp.ndarray, teacher_q: jnp.ndarray,
                    normalize: bool = True) -> jnp.ndarray:
    """Similarity-matrix MSE distillation loss (distill.py:273-276):
    MSE( sim(student_q), sim(teacher_q) ), where sim() L2-normalizes
    rows first (compute_sim_matrix, distill.py:44-47)."""
    if normalize:
        s, t = sim_matrix(student_q), sim_matrix(teacher_q)
    else:
        s = jnp.dot(student_q.astype(jnp.float32),
                    student_q.astype(jnp.float32).T,
                    preferred_element_type=jnp.float32)
        t = jnp.dot(teacher_q.astype(jnp.float32),
                    teacher_q.astype(jnp.float32).T,
                    preferred_element_type=jnp.float32)
    t = jax.lax.stop_gradient(t)
    return jnp.mean((s - t) ** 2)
