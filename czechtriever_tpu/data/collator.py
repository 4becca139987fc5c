"""Batch collation to static device shapes.

The reference pads each batch to its longest sequence
(/root/reference/src/data.py:563-573), which is fine for CUDA but would
force an XLA recompile per unique length. Here every batch is padded to a
*fixed* bucket length (chunk_length + 2 covers the worst case: a full
chunk crop plus bos+eos), so the jitted train step compiles exactly once.
The attention mask carries the true lengths, and the loss/pooling math is
mask-aware, so the numbers are unchanged — only the shapes are static.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def pad_batch(seqs: Sequence[np.ndarray], max_length: int,
              pad_id: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Pad variable-length int sequences to [B, max_length] ids + mask."""
    B = len(seqs)
    ids = np.full((B, max_length), pad_id, dtype=np.int32)
    mask = np.zeros((B, max_length), dtype=np.int32)
    for i, s in enumerate(seqs):
        n = min(len(s), max_length)
        ids[i, :n] = s[:n]
        mask[i, :n] = 1
    return ids, mask


def build_mask(seqs: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Pad-to-longest parity helper (src/data.py:563-573) for host-side
    eval paths where shapes need not be static."""
    maxlength = max(len(s) for s in seqs)
    return pad_batch(seqs, maxlength)


class PairCollator:
    """List of {q_tokens, k_tokens} -> fixed-shape device-ready batch,
    the static-shape equivalent of the reference Collator
    (src/data.py:531-550)."""

    def __init__(self, max_length: int, pad_id: int = 0):
        self.max_length = max_length
        self.pad_id = pad_id

    def __call__(self, examples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        q_tokens, q_mask = pad_batch([e["q_tokens"] for e in examples],
                                     self.max_length, self.pad_id)
        k_tokens, k_mask = pad_batch([e["k_tokens"] for e in examples],
                                     self.max_length, self.pad_id)
        out = {"q_tokens": q_tokens, "q_mask": q_mask,
               "k_tokens": k_tokens, "k_mask": k_mask}
        if examples and "dataset_id" in examples[0]:
            # provenance tag from MultiDataset mixtures (host-side only;
            # the trainer strips non-token keys before device transfer)
            out["dataset_id"] = np.asarray(
                [e["dataset_id"] for e in examples], dtype=object)
        return out
