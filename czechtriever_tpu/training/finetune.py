"""Supervised finetuning: evaluation loop.

The finetune *training* step is the plain InBatch objective with
keys = [golds; negatives] (the reference reuses InBatch.forward with the
triplet collator's ``k_tokens``, /root/reference/finetuning.py:73 +
src/inbatch.py:59-90; ``ops.losses.inbatch_loss`` already supports more
keys than queries). This module adds the eval from
/root/reference/finetuning.py:123-196: encode all queries/golds/
negatives, score every query against every gold (positives) and negative,
and report accuracy (argmax == own gold) and MRR of the gold's rank.

Cross-rank mechanics (varsize_gather of golds/negatives + label offset,
finetuning.py:170-174) disappear: each host holds its rank-strided shard
and metrics are weighted-averaged across hosts, which is the same number
the reference computes.
"""

from __future__ import annotations

import logging
from typing import Dict

import jax
import numpy as np

from czechtriever_tpu.models import bert
from czechtriever_tpu.models.contriever import encode

logger = logging.getLogger(__name__)


def _encode_all(params, mcfg, ids, mask, batch_size, normalize, pooling):
    out = []
    n = ids.shape[0]
    pad = (-n) % batch_size
    if pad:
        ids = np.pad(ids, ((0, pad), (0, 0)))
        mask = np.pad(mask, ((0, pad), (0, 0)))
        mask[n:, 0] = 1  # no all-pad rows
    for s in range(0, ids.shape[0], batch_size):
        emb = encode(params, mcfg, ids[s:s + batch_size],
                     mask[s:s + batch_size], deterministic=True,
                     normalize=normalize, pooling_mode=pooling)
        out.append(emb)  # stays on device: batches pipeline async
    return np.concatenate([np.asarray(e) for e in out], axis=0)[:n]


def evaluate_finetune(params: bert.Params, mcfg: bert.BertConfig, cfg,
                      batcher, batch_size: int = 64) -> Dict[str, float]:
    """Returns {"eval_acc": %, "mrr": float} (finetuning.py:176-189).

    ``batcher`` yields triplet collator batches (g_tokens/n_tokens rows
    aligned with q rows; negatives may be empty).
    """
    all_q, all_g, all_n = [], [], []
    for batch in batcher.epoch():
        all_q.append((batch["q_tokens"], batch["q_mask"]))
        all_g.append((batch["g_tokens"], batch["g_mask"]))
        if batch["n_tokens"].shape[0]:
            all_n.append((batch["n_tokens"], batch["n_mask"]))
    if not all_q:
        return {}

    def cat(pairs):
        return (np.concatenate([p[0] for p in pairs]),
                np.concatenate([p[1] for p in pairs]))

    q_ids, q_mask = cat(all_q)
    g_ids, g_mask = cat(all_g)
    q_emb = _encode_all(params, mcfg, q_ids, q_mask, batch_size,
                        cfg.norm_query, cfg.pooling)
    g_emb = _encode_all(params, mcfg, g_ids, g_mask, batch_size,
                        cfg.norm_doc, cfg.pooling)
    if all_n:
        n_ids, n_mask = cat(all_n)
        n_emb = _encode_all(params, mcfg, n_ids, n_mask, batch_size,
                            cfg.norm_doc, cfg.pooling)
        scores = np.concatenate([q_emb @ g_emb.T, q_emb @ n_emb.T], axis=1)
    else:
        scores = q_emb @ g_emb.T

    labels = np.arange(len(q_emb))
    argmax_idx = scores.argmax(axis=1)
    acc = 100.0 * float((argmax_idx == labels).mean())
    # MRR of the gold's rank under descending sort (finetuning.py:177-183)
    order = np.argsort(-scores, axis=1, kind="stable")
    ranks = (order == labels[:, None]).argmax(axis=1)
    mrr = float((1.0 / (ranks + 1.0)).mean())
    return {"eval_acc": acc, "mrr": mrr, "n_queries": float(len(q_emb))}
