"""Supervised finetuning data: (query, gold, negatives) triplets.

TPU-native counterpart of /root/reference/src/finetuning_data.py:

  * ``TripletDataset`` — json/jsonl DPR-style examples with
    {question, positive_ctxs, negative_ctxs, hard_negative_ctxs};
    rank-strided loading (finetuning_data.py:85-110), random gold choice
    and mixed hard/random negative sampling with ``negative_hard_ratio``
    / ``negative_hard_min_idx`` (finetuning_data.py:112-124).
  * ``TripletCollator`` — raw text -> static-shape token batches
    {q,k,g,n}_tokens/_mask where k = [golds; negatives]
    (finetuning_data.py:127-171). The reference pads to the batch's
    longest sequence; we pad to ``passage_maxlength`` so the jitted step
    compiles once (mask-aware math keeps numbers identical).

Static-shape caveat: the train step needs a fixed negative count per
example, so when an example has fewer candidates than ``negative_ctxs``
the sampled negatives are repeated to fill (the contrastive loss treats
duplicates as the same negative; the reference instead emits a ragged
batch). Examples with no negatives at all contribute gold-only rows
repeated as their own negatives — avoid those in training data.
"""

from __future__ import annotations

import json
import logging
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def _ctx_text(ctx: Dict) -> str:
    """title + ' ' + text when a non-empty title exists
    (finetuning_data.py:55-60)."""
    title = ctx.get("title", "")
    return (title + " " + ctx["text"]) if title else ctx["text"]


class TripletDataset:
    """DPR-style supervised examples with negative sampling."""

    def __init__(self, datapaths: Sequence[str], negative_ctxs: int = 1,
                 negative_hard_ratio: float = 0.0,
                 negative_hard_min_idx: int = 0, training: bool = False,
                 shard_id: int = -1, num_shards: int = -1,
                 maxload: Optional[int] = None, normalize: bool = False,
                 seed: int = 0):
        self.negative_ctxs = negative_ctxs
        self.negative_hard_ratio = negative_hard_ratio
        self.negative_hard_min_idx = negative_hard_min_idx
        self.training = training
        if normalize:
            from czechtriever_tpu.data.normalize_text import normalize as nfn
            self.normalize_fn = nfn
        else:
            self.normalize_fn = lambda x: x
        self.rng = np.random.default_rng(seed)
        self.data: List[Dict] = []
        self._load(datapaths, shard_id, num_shards, maxload)

    def _load(self, datapaths, shard_id, num_shards, maxload):
        counter = 0
        for path in datapaths:
            path = str(path)
            if path.endswith(".jsonl"):
                with open(path, encoding="utf-8") as f:
                    rows = (json.loads(line) for line in f)
                    counter = self._take(rows, shard_id, num_shards,
                                         counter, maxload)
            elif path.endswith(".json"):
                with open(path, encoding="utf-8") as f:
                    counter = self._take(iter(json.load(f)), shard_id,
                                         num_shards, counter, maxload)
            if maxload and counter >= maxload:
                break

    def _take(self, rows: Iterator[Dict], shard_id, num_shards, counter,
              maxload) -> int:
        # rank-strided: example i goes to shard (i+1) % num_shards
        # (finetuning_data.py:91-93 keeps `counter % world_size == rank`)
        for ex in rows:
            counter += 1
            if shard_id > -1 and counter % num_shards != shard_id:
                continue
            self.data.append(ex)
            if maxload and counter >= maxload:
                break
        return counter

    def __len__(self) -> int:
        return len(self.data)

    def sample_n_hard_negatives(self, ex: Dict) -> tuple:
        """Bernoulli(negative_hard_ratio) per negative slot
        (finetuning_data.py:112-124)."""
        if "hard_negative_ctxs" in ex:
            n_hard = int((self.rng.random(self.negative_ctxs)
                          < self.negative_hard_ratio).sum())
            n_hard = min(n_hard, len(
                ex["hard_negative_ctxs"][self.negative_hard_min_idx:]))
        else:
            n_hard = 0
        n_random = self.negative_ctxs - n_hard
        n_random = min(n_random, len(ex.get("negative_ctxs", [])))
        if "negative_ctxs" not in ex:
            n_random = 0
        return n_hard, n_random

    def __getitem__(self, index: int) -> Dict:
        ex = self.data[index]
        question = ex["question"]
        if self.training:
            gold = ex["positive_ctxs"][
                int(self.rng.integers(0, len(ex["positive_ctxs"])))]
            n_hard, n_random = self.sample_n_hard_negatives(ex)
            negatives: List[Dict] = []
            if n_random > 0:
                idx = self.rng.choice(len(ex["negative_ctxs"]), n_random,
                                      replace=False)
                negatives += [ex["negative_ctxs"][i] for i in idx]
            if n_hard > 0:
                pool = ex["hard_negative_ctxs"][self.negative_hard_min_idx:]
                idx = self.rng.choice(len(pool), n_hard, replace=False)
                negatives += [pool[i] for i in idx]
        else:
            gold = ex["positive_ctxs"][0]
            negatives = ([ex["negative_ctxs"][0]]
                         if ex.get("negative_ctxs") else [])
        # static shape: fill to exactly negative_ctxs by cycling
        if self.training and negatives:
            n_sampled = len(negatives)
            while len(negatives) < self.negative_ctxs:
                negatives.append(negatives[len(negatives) % n_sampled])
        return {
            "query": self.normalize_fn(question),
            "gold": self.normalize_fn(_ctx_text(gold)),
            "negatives": [self.normalize_fn(_ctx_text(n))
                          for n in negatives],
        }


class TripletCollator:
    """Raw-text triplets -> static-shape token batch
    (finetuning_data.py:127-171). k = [golds; negatives]."""

    def __init__(self, tokenizer, passage_maxlength: int = 200):
        self.tokenizer = tokenizer
        self.maxlength = passage_maxlength

    def _encode(self, texts: List[str]):
        from czechtriever_tpu.data.tokenizer import batch_encode_any
        ids, mask = batch_encode_any(
            self.tokenizer, texts, max_length=self.maxlength,
            add_special_tokens=True)
        L = ids.shape[1]
        if L < self.maxlength:
            ids = np.pad(ids, ((0, 0), (0, self.maxlength - L)))
            mask = np.pad(mask, ((0, 0), (0, self.maxlength - L)))
        return ids.astype(np.int32), mask.astype(np.int32)

    def __call__(self, batch: List[Dict]) -> Dict[str, np.ndarray]:
        queries = [ex["query"] for ex in batch]
        golds = [ex["gold"] for ex in batch]
        negs = [n for ex in batch for n in ex["negatives"]]
        allpassages = golds + negs
        q_tokens, q_mask = self._encode(queries)
        k_tokens, k_mask = self._encode(allpassages)
        g_tokens, g_mask = k_tokens[:len(golds)], k_mask[:len(golds)]
        n_tokens, n_mask = k_tokens[len(golds):], k_mask[len(golds):]
        return {"q_tokens": q_tokens, "q_mask": q_mask,
                "k_tokens": k_tokens, "k_mask": k_mask,
                "g_tokens": g_tokens, "g_mask": g_mask,
                "n_tokens": n_tokens, "n_mask": n_mask}


class TripletBatcher:
    """Shuffled fixed-size epochs over a TripletDataset (replaces torch
    RandomSampler + DataLoader, finetuning.py:49-58); drops the last
    partial batch (drop_last=True)."""

    def __init__(self, dataset: TripletDataset, collator: TripletCollator,
                 batch_size: int, seed: int = 0, shuffle: bool = True):
        self.dataset = dataset
        self.collator = collator
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        order = (self.rng.permutation(len(self.dataset)) if self.shuffle
                 else np.arange(len(self.dataset)))
        for s in range(0, len(order) - self.batch_size + 1, self.batch_size):
            yield self.collator([self.dataset[int(i)]
                                 for i in order[s:s + self.batch_size]])
