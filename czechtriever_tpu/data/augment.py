"""Host-side token augmentations for contrastive pair construction.

Numpy implementations of the reference's crop/augment ops
(/root/reference/src/data.py:553-652). These run on the host because they
produce variable-length sequences; the collator then pads to a static
bucket so device shapes stay fixed (see collator.py). Sampling
distributions match the reference exactly:

  * randomcrop: ratio ~ U[min,max], length = int(len*ratio),
    start ~ randint inclusive (src/data.py:553-560)
  * delete/replace/mask: per-token Bernoulli(p) keep/replace decisions
    (src/data.py:581-598)
  * shuffle: Binomial(n,p)-sized random subset permuted in place
    (src/data.py:601-610)

All functions take an explicit ``np.random.Generator`` — no global RNG —
so the pipeline is reproducible and shardable per host.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def random_crop(x: np.ndarray, ratio_min: float, ratio_max: float,
                rng: np.random.Generator) -> np.ndarray:
    """Contiguous crop with ratio ~ U[ratio_min, ratio_max]."""
    n = len(x)
    ratio = rng.uniform(ratio_min, ratio_max)
    length = int(n * ratio)
    start = rng.integers(0, n - length + 1)  # inclusive upper like randint
    return x[start:start + length].copy()


def delete_word(x: np.ndarray, p: float, rng: np.random.Generator) -> np.ndarray:
    keep = rng.random(len(x)) > p
    return x[keep]


def replace_word(x: np.ndarray, min_random: int, max_random: int, p: float,
                 rng: np.random.Generator) -> np.ndarray:
    hit = rng.random(len(x)) <= p
    repl = rng.integers(min_random, max_random + 1, size=len(x))
    return np.where(hit, repl, x).astype(x.dtype)


def mask_word(x: np.ndarray, mask_id: int, p: float,
              rng: np.random.Generator) -> np.ndarray:
    hit = rng.random(len(x)) <= p
    return np.where(hit, mask_id, x).astype(x.dtype)


def shuffle_word(x: np.ndarray, p: float, rng: np.random.Generator) -> np.ndarray:
    x = x.copy()
    count = int((rng.random(len(x)) < p).sum())
    idx = rng.choice(len(x), size=count, replace=False)
    x[idx] = x[rng.permutation(idx)]
    return x


def apply_augmentation(x: np.ndarray, augmentation: str, prob: float,
                       rng: np.random.Generator, *, mask_id: int = 0,
                       start_id: int = 0, vocab_size: int = 0) -> np.ndarray:
    """Dispatch matching src/data.py:613-632."""
    if augmentation == "mask":
        return mask_word(x, mask_id, prob, rng)
    if augmentation == "replace":
        return replace_word(x, start_id, vocab_size - 1, prob, rng)
    if augmentation == "delete":
        return delete_word(x, prob, rng)
    if augmentation == "shuffle":
        return shuffle_word(x, prob, rng)
    return x


def add_bos_eos(x: np.ndarray, bos_token_id: Optional[int],
                eos_token_id: Optional[int]) -> np.ndarray:
    """Prepend/append special tokens (src/data.py:635-652)."""
    parts = []
    if bos_token_id is not None:
        parts.append(np.array([bos_token_id], dtype=np.int32))
    parts.append(np.asarray(x, dtype=np.int32))
    if eos_token_id is not None:
        parts.append(np.array([eos_token_id], dtype=np.int32))
    return np.concatenate(parts) if len(parts) > 1 else parts[0]


def build_pair(tokens: np.ndarray, *, ratio_min: float, ratio_max: float,
               augmentation: str, prob_augmentation: float,
               bos_token_id: Optional[int], eos_token_id: Optional[int],
               rng: np.random.Generator, mask_id: int = 0, start_id: int = 0,
               vocab_size: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """chunk -> (q_tokens, k_tokens): two independent crops, each augmented
    and wrapped in bos/eos (src/data.py:309-321)."""
    out = []
    for _ in range(2):
        crop = random_crop(tokens, ratio_min, ratio_max, rng)
        crop = apply_augmentation(crop, augmentation, prob_augmentation, rng,
                                  mask_id=mask_id, start_id=start_id,
                                  vocab_size=vocab_size)
        out.append(add_bos_eos(crop, bos_token_id, eos_token_id))
    return out[0], out[1]
