"""Validation InfoNCE loss + recall@10 (reference eval_loss,
/root/reference/train.py:43-145).

Semantics: encode one random augmented crop of every validation doc (the
"corpus"); for each validation pair batch, negatives are all corpus
crops *except the batch's own documents* (leave-batch-out). Logits are
[l_pos | q . negatives] / T, CE against label 0; recall@10 counts label 0
in the top 10. One deviation for XLA: excluded columns are masked to
-inf instead of physically removed — identical loss/recall (exp(-inf)=0),
but static shapes, so the whole sweep jits.

The first batch's logits are dumped to <output_dir>/logits/step-N.pkl
(train.py:108-111 parity).
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from czechtriever_tpu.data.collator import build_mask, pad_batch
from czechtriever_tpu.models import bert
from czechtriever_tpu.models.contriever import encode

NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnames=("mcfg", "pooling", "normalize",
                                             "temperature", "k"))
def _val_batch_metrics(params, mcfg, q_ids, q_mask, k_ids, k_mask, corpus_emb,
                       excluded, pooling: str, normalize: bool,
                       temperature: float, k: int = 10):
    q = encode(params, mcfg, q_ids, q_mask, pooling_mode=pooling,
               normalize=normalize)
    kk = encode(params, mcfg, k_ids, k_mask, pooling_mode=pooling,
                normalize=normalize)
    l_pos = jnp.einsum("nc,nc->n", q, kk)[:, None]
    l_neg = jnp.dot(q, corpus_emb.T, preferred_element_type=jnp.float32)
    N = l_neg.shape[1]
    mask_out = jnp.zeros((N,), jnp.bool_).at[excluded].set(
        True, mode="drop")  # out-of-range sentinel indices are dropped
    l_neg = jnp.where(mask_out[None, :], NEG_INF, l_neg)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -logp[:, 0].mean()
    _, topk = jax.lax.top_k(logits, k)
    hit = (topk == 0).any(axis=1).astype(jnp.float32).mean()
    stdq = jnp.std(q, axis=0, ddof=1).mean()
    stdk = jnp.std(kk, axis=0, ddof=1).mean()
    return loss, hit, stdq, stdk, logits


def eval_loss(params, mcfg: bert.BertConfig, cfg, val_dataset,
              corpus_crops: Sequence[np.ndarray], step: int,
              output_dir: Optional[str] = None,
              max_batches: Optional[int] = None) -> Dict[str, float]:
    """Returns {loss, recall@10, stdq, stdk} over the validation set."""
    bs = cfg.per_device_eval_batch_size
    normalize = cfg.eval_normalize_text

    # encode the leave-out corpus (reference drops the remainder batch,
    # train.py:52; but a val set SMALLER than one eval batch — e.g. a
    # val_data_ratio carve of a small corpus — must not drop to zero)
    nb = len(corpus_crops) // bs
    if nb == 0:
        if not corpus_crops:
            return {}
        nb, bs = 1, len(corpus_crops)
    embs = []
    for i in range(nb):
        ids, mask = build_mask(corpus_crops[i * bs:(i + 1) * bs])
        L = ids.shape[1]
        Lp = -(-L // 64) * 64
        ids = np.pad(ids, ((0, 0), (0, Lp - L)))
        mask = np.pad(mask, ((0, 0), (0, Lp - L)))
        embs.append(np.asarray(encode(
            params, mcfg, jnp.asarray(ids), jnp.asarray(mask),
            pooling_mode=cfg.pooling, normalize=normalize)))
    corpus_emb = jnp.asarray(np.concatenate(embs, axis=0))
    n_corpus = corpus_emb.shape[0]

    losses, recalls, stdqs, stdks = [], [], [], []
    n_batches = len(val_dataset) // cfg.per_device_batch_size
    if max_batches:
        n_batches = min(n_batches, max_batches)
    max_len = cfg.chunk_length + 2

    def batch_gen():
        for b in range(n_batches):
            idxs = list(range(b * cfg.per_device_batch_size,
                              (b + 1) * cfg.per_device_batch_size))
            examples = [val_dataset[i] for i in idxs]
            qt, qm = pad_batch([e["q_tokens"] for e in examples], max_len)
            kt, km = pad_batch([e["k_tokens"] for e in examples], max_len)
            excluded = jnp.asarray(
                [i if i < n_corpus else n_corpus for i in idxs], jnp.int32)
            yield b, qt, qm, kt, km, excluded

    # host-side batch prep overlaps the device sweep; depth follows the
    # reference's validation DataLoader worker count
    # (--num_workers_valid, train.py:205-210)
    nwv = int(getattr(cfg, "num_workers_valid", 0) or 0)
    if nwv > 0:
        from czechtriever_tpu.data.datasets import _Prefetcher
        batches = iter(_Prefetcher(batch_gen, depth=nwv))
    else:
        batches = batch_gen()
    for b, qt, qm, kt, km, excluded in batches:
        loss, hit, stdq, stdk, logits = _val_batch_metrics(
            params, mcfg, jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(kt),
            jnp.asarray(km), corpus_emb, excluded, cfg.pooling, normalize,
            cfg.temperature)
        if b == 0 and output_dir:
            os.makedirs(os.path.join(output_dir, "logits"), exist_ok=True)
            with open(os.path.join(output_dir, "logits",
                                   f"step-{step}.pkl"), "wb") as f:
                pickle.dump(np.asarray(logits), f)
        losses.append(float(loss))
        recalls.append(float(hit))
        stdqs.append(float(stdq))
        stdks.append(float(stdk))

    if not losses:
        return {}
    return {"loss": float(np.mean(losses)),
            "recall@10": 100.0 * float(np.mean(recalls)),
            "stdq": float(np.mean(stdqs)), "stdk": float(np.mean(stdks))}
