"""Length-aware sequence packing (host side).

The recipe's training pairs are random crops of ratio 0.1-0.5 from
256-token chunks (/root/reference/src/options.py:109-110), so real crop
lengths run ~28-130 tokens with mean ~80 — yet the static-shape pipeline
pads every crop to the fixed 136-column bucket (data/datasets.py
_crop_max_length), spending ~40% of encoder FLOPs on padding. The
reference pays the same tax with pad-to-longest (~130 at B=256,
/root/reference/src/data.py:563-573); packing is therefore
beat-the-yardstick headroom, not a parity requirement.

This module is the host half of the fix: first-fit-decreasing bin
packing of a microbatch's crops into a fixed number of ``R``-token row
blocks. Each block concatenates several crops back to back; three
parallel int32 arrays describe the layout to the device:

  tokens  [n_blocks, R]  packed token ids (pad_id in unused tail slots)
  seg_ids [n_blocks, R]  the GLOBAL crop index of each token, -1 = pad
  pos_ids [n_blocks, R]  position within the crop (restarts at 0)

The device half lives in models/bert.py (``forward_packed``: the fused
attention kernel builds a block-diagonal mask from seg_ids so packed
crops cannot attend each other; FFN / LayerNorm / out-proj are row-local
and need no change) and ops/pooling.py (``segment_mean_pool``). Packing
stays WITHIN the microbatch, so batch membership — and the loss at
dropout 0 — is unchanged vs the unpacked pipeline.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def pack_lengths(lengths: Sequence[int], rows: int) -> List[List[int]]:
    """First-fit-decreasing bin packing.

    Returns a list of blocks, each a list of item indices, such that the
    lengths in every block sum to <= ``rows``. FFD is within 11/9 OPT + 1
    of optimal and, at the recipe distribution (mean ~80 in R=256..512
    bins), packs to ~97% occupancy in practice.
    """
    lengths = np.asarray(lengths)
    if np.any(lengths > rows):
        raise ValueError(
            f"crop of length {int(lengths.max())} exceeds the {rows}-row "
            f"block budget; raise pack_rows or shorten crops")
    order = np.argsort(-lengths, kind="stable")
    blocks: List[List[int]] = []
    space: List[int] = []
    for i in order:
        li = int(lengths[i])
        for j in range(len(blocks)):
            if space[j] >= li:
                blocks[j].append(int(i))
                space[j] -= li
                break
        else:
            blocks.append([int(i)])
            space.append(rows - li)
    return blocks


def blocks_needed(lengths: Sequence[int], rows: int) -> int:
    return len(pack_lengths(lengths, rows))


def pack_sequences(seqs: Sequence[np.ndarray], rows: int,
                   n_blocks: Optional[int] = None, pad_id: int = 0,
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pack variable-length token sequences into fixed [n_blocks, rows].

    Returns (tokens, seg_ids, pos_ids, lengths); ``lengths`` is the
    [N] int32 real-length vector (its static shape carries the crop
    count into the jitted step, and it feeds length stats). ``n_blocks``
    pads the block axis up to a caller-fixed static shape.
    """
    lens = np.asarray([len(s) for s in seqs], dtype=np.int32)
    blocks = pack_lengths(lens, rows)
    nb = len(blocks) if n_blocks is None else n_blocks
    if len(blocks) > nb:
        raise ValueError(f"packing needs {len(blocks)} blocks > "
                         f"n_blocks={nb}")
    tokens = np.full((nb, rows), pad_id, dtype=np.int32)
    seg_ids = np.full((nb, rows), -1, dtype=np.int32)
    pos_ids = np.zeros((nb, rows), dtype=np.int32)
    for bi, idxs in enumerate(blocks):
        off = 0
        for i in idxs:
            n = int(lens[i])
            tokens[bi, off:off + n] = seqs[i][:n]
            seg_ids[bi, off:off + n] = i
            pos_ids[bi, off:off + n] = np.arange(n, dtype=np.int32)
            off += n
    return tokens, seg_ids, pos_ids, lens


def pack_padded_batch(ids: np.ndarray, mask: np.ndarray, rows: int,
                      n_blocks: Optional[int] = None, pad_id: int = 0):
    """Pack an already-padded [B, L] ids+mask batch (the PairCollator
    output shape) — convenience for retrofitting existing pipelines."""
    lens = mask.astype(np.int64).sum(axis=1)
    seqs = [ids[i, :lens[i]] for i in range(ids.shape[0])]
    return pack_sequences(seqs, rows, n_blocks, pad_id)


def rebalance_assignment(q_lens: np.ndarray, k_lens: np.ndarray,
                         n_bins: int, bin_size: int) -> List[np.ndarray]:
    """LPT-assign pairs to ``n_bins`` equal-size bins to equalize packed
    block need across microbatches.

    ``q_lens``/``k_lens`` are flat [N] real-length vectors over one
    optimizer step's pairs (N = n_bins * bin_size); pair i moves as a
    unit (its q and k crops stay in the same microbatch, so seg j in a
    microbatch keeps naming one (q, k) pair). Returns per-bin index
    arrays into the flat pair axis, each exactly ``bin_size`` long —
    equal counts keep the accumulated mean-loss gradient a mean over
    the same pair multiset.

    Why this exists: the step's [A, nb, R] stack is rectangular, so nb
    is the WORST of the 2A per-microbatch packings (measured 43-44
    blocks vs the 42 per-micro sum bound at B=128/R=256 — density
    0.886). Longest-processing-time greedy on q+k length drives every
    microbatch to the sum bound (density ~0.928 at the recipe
    distribution). This DOES change batch membership — which keys sit
    together in a microbatch and therefore the MoCo queue's within-step
    enqueue order — so it is opt-in (Config.pack_rebalance); with a
    131k queue the ordering perturbation is epsilon-scale, but it is a
    deviation, unlike plain packing which preserves membership exactly.
    """
    q_lens = np.asarray(q_lens, dtype=np.int64).reshape(-1)
    k_lens = np.asarray(k_lens, dtype=np.int64).reshape(-1)
    n = q_lens.shape[0]
    if n != n_bins * bin_size:
        raise ValueError(f"{n} pairs do not fill {n_bins} x {bin_size}")
    cost = q_lens + k_lens
    order = np.argsort(-cost, kind="stable")
    bins: List[List[int]] = [[] for _ in range(n_bins)]
    load = np.zeros(n_bins, dtype=np.int64)
    counts = np.zeros(n_bins, dtype=np.int64)
    for i in order:
        # smallest-load bin with space; ties resolve to the lowest bin
        # index so the assignment is deterministic
        elig = np.flatnonzero(counts < bin_size)
        b = int(elig[np.argmin(load[elig])])
        bins[b].append(int(i))
        load[b] += int(cost[i])
        counts[b] += 1
    return [np.asarray(b, dtype=np.int64) for b in bins]


def quantize_blocks(nb: int, quantum: int = 4) -> int:
    """Round a block count up to a shape quantum so the jitted step sees
    only a handful of distinct [A, n_blocks, R] shapes (each new shape
    is one XLA compile, cached thereafter)."""
    return -(-nb // quantum) * quantum
