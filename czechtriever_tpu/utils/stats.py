"""Training-statistics aggregation.

``WeightedAvgStats`` parity with /root/reference/src/utils.py:223-265:
weighted running means per key, with cross-process reduction for
multi-host runs (the reference broadcasts keys + weighted-all-reduces
over NCCL, src/dist_utils.py:139-148; here the per-step stats coming out
of the jitted train step are already globally consistent under pjit, so
cross-process sync is only needed for host-side counters — done with
multihost_utils when more than one process is present).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Tuple, Union

import jax
import numpy as np

Number = Union[float, int]


class WeightedAvgStats:
    def __init__(self):
        self.raw_stats: Dict[str, float] = defaultdict(float)
        self.total_weights: Dict[str, float] = defaultdict(float)

    def update(self, vals: Dict[str, Tuple[Number, Number]]) -> None:
        for key, (value, weight) in vals.items():
            self.raw_stats[key] += float(value) * float(weight)
            self.total_weights[key] += float(weight)

    def update_means(self, means: Dict[str, Number], weight: Number) -> None:
        """Convenience for the train-step stats dict (equal weights)."""
        self.update({k: (float(v), weight) for k, v in means.items()})

    @property
    def stats(self) -> Dict[str, float]:
        return {k: self.raw_stats[k] / self.total_weights[k]
                for k in self.raw_stats}

    @property
    def tuple_stats(self) -> Dict[str, Tuple[float, float]]:
        return {k: (self.raw_stats[k] / self.total_weights[k],
                    self.total_weights[k]) for k in self.raw_stats}

    def reset(self) -> None:
        self.raw_stats = defaultdict(float)
        self.total_weights = defaultdict(float)

    @property
    def average_stats(self) -> Dict[str, float]:
        """Cross-process weighted average (src/utils.py:253-265)."""
        if jax.process_count() == 1:
            return self.stats
        from jax.experimental import multihost_utils
        keys = sorted(self.raw_stats.keys())
        sums = np.array([self.raw_stats[k] for k in keys])
        wts = np.array([self.total_weights[k] for k in keys])
        gathered = multihost_utils.process_allgather(
            np.stack([sums, wts]))  # [P, 2, K]
        tot = gathered.sum(axis=0)
        return {k: tot[0, i] / max(tot[1, i], 1e-12)
                for i, k in enumerate(keys)}
