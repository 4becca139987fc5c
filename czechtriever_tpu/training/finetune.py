"""Supervised finetuning: evaluation loop.

The finetune *training* step is the plain InBatch objective with
keys = [golds; negatives] (the reference reuses InBatch.forward with the
triplet collator's ``k_tokens``, /root/reference/finetuning.py:73 +
src/inbatch.py:59-90; ``ops.losses.inbatch_loss`` already supports more
keys than queries). This module adds the eval from
/root/reference/finetuning.py:123-196: encode all queries/golds/
negatives, score every query against every gold (positives) and negative,
and report accuracy (argmax == own gold) and MRR of the gold's rank.

Cross-rank mechanics survive the port: the reference varsize-gathers
golds and negatives across ranks and offsets each rank's labels
(finetuning.py:170-174) so every query scores against the GLOBAL
distractor set. Multi-process here does the same with
``mesh.allgather_host_rows`` on the pooled embeddings, then
weighted-averages the per-query accuracy/MRR across processes — every
process returns the identical global metrics.
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
    aligned with q rows; negatives may be empty). Under multiple
    processes each process encodes its rank-strided shard, golds and
    negatives are allgathered so every query scores against the global
    set (the reference's varsize_gather + label offset,
    finetuning.py:170-174), and the metrics are weighted-averaged —
    identical on every process.
    """
    import jax as _jax

    from czechtriever_tpu.parallel import mesh as meshlib

    multiproc = _jax.process_count() > 1
    if multiproc:
        # the finetune eval hook passes the trainer's GLOBAL-mesh device
        # params; each process encodes per-rank host batches locally, so
        # pull global arrays to host first (replicated: local fetch;
        # TP-sharded: process_allgather) — see mesh.host_safe
        params = meshlib.host_safe(params)
    all_q, all_g, all_n = [], [], []
    for batch in batcher.epoch():
        all_q.append((batch["q_tokens"], batch["q_mask"]))
        all_g.append((batch["g_tokens"], batch["g_mask"]))
        if batch["n_tokens"].shape[0]:
            all_n.append((batch["n_tokens"], batch["n_mask"]))
    if not all_q and not multiproc:
        return {}

    def cat(pairs, dim_hint=4):
        if not pairs:
            return (np.zeros((0, dim_hint), np.int32),
                    np.zeros((0, dim_hint), np.int32))
        return (np.concatenate([p[0] for p in pairs]),
                np.concatenate([p[1] for p in pairs]))

    def enc(pairs, normalize):
        ids, mask = cat(pairs)
        if ids.shape[0] == 0:
            return np.zeros((0, mcfg.hidden_size), np.float32)
        return _encode_all(params, mcfg, ids, mask, batch_size, normalize,
                           cfg.pooling)

    q_emb = enc(all_q, cfg.norm_query)
    g_emb = enc(all_g, cfg.norm_doc)
    n_emb = enc(all_n, cfg.norm_doc)

    if multiproc:
        # global distractor set: [golds of all ranks; negs of all ranks];
        # this rank's gold for query i sits at (rows before it) + i
        g_parts = meshlib.allgather_host_rows(g_emb)
        n_parts = meshlib.allgather_host_rows(n_emb)
        me = _jax.process_index()
        label_offset = sum(p.shape[0] for p in g_parts[:me])
        g_all = np.concatenate(g_parts, axis=0)
        n_all = np.concatenate(n_parts, axis=0)
    else:
        label_offset = 0
        g_all, n_all = g_emb, n_emb

    if q_emb.shape[0]:
        scores = np.concatenate([q_emb @ g_all.T, q_emb @ n_all.T], axis=1)
        labels = label_offset + np.arange(len(q_emb))
        correct = float((scores.argmax(axis=1) == labels).sum())
        # MRR of the gold's rank under descending sort
        # (finetuning.py:177-183)
        order = np.argsort(-scores, axis=1, kind="stable")
        ranks = (order == labels[:, None]).argmax(axis=1)
        rr_sum = float((1.0 / (ranks + 1.0)).sum())
        n = float(len(q_emb))
    else:
        correct = rr_sum = n = 0.0

    if multiproc:
        sums = np.concatenate(meshlib.allgather_host_rows(
            np.asarray([[correct, rr_sum, n]], np.float64)), axis=0)
        correct, rr_sum, n = sums.sum(axis=0)
    if n == 0:
        return {}
    return {"eval_acc": 100.0 * correct / n, "mrr": rr_sum / n,
            "n_queries": float(n)}
