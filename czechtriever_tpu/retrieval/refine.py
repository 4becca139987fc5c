"""Exact re-rank stage for the compressed engines (round-5 stretch #8).

FAISS deployments answer PQ's quantization ceiling with
``IndexRefineFlat``: the compressed index proposes ``refine_factor * k``
candidates cheaply, then the ORIGINAL vectors re-score just those and
the exact top-k wins. At m=96/n_bits=8 the ADC ceiling caps recall@10
near 0.20 on hard corpora regardless of nprobe (docs/PERF.md round-4
sweep) — refinement converts candidate-set recall (recall@R, much
higher) into top-k recall.

Memory model: the original vectors live on the HOST (bf16 via
ml_dtypes, 2 bytes/dim), NOT in HBM — the compressed engines exist
precisely because the originals don't fit the chip. ``memory_bytes``
reports base + originals so the equal-memory discipline of BASELINE.md
stays honest. Re-scoring runs as one host BLAS batched matmul per
query batch ([Q, 1, D] @ [Q, D, R]): Q=256, R=1000, D=768 is ~0.4
GFLOP — microseconds-per-query next to the device ADC scan.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

try:  # bf16 host storage (2 B/dim); jax always ships ml_dtypes
    import ml_dtypes
    _BF16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BF16 = np.dtype(np.float16)

NEG_INF = float("-inf")


class RefinedIndex:
    """Wrap a PQIndex / IVFPQIndex with an exact re-rank stage.

    Same external contract as the engines (index_data / search_knn /
    serialize / deserialize_from): drop-in for the retrieve CLI.
    """

    def __init__(self, base, refine_factor: int = 10,
                 store_dtype=None):
        self.base = base
        self.refine_factor = max(1, int(refine_factor))
        self.store_dtype = np.dtype(store_dtype) if store_dtype else _BF16
        self._orig_chunks: List[np.ndarray] = []
        self._originals: Optional[np.ndarray] = None

    # -- delegation ----------------------------------------------------------
    @property
    def index_id_to_db_id(self):
        return self.base.index_id_to_db_id

    @property
    def ntotal(self) -> int:
        return self.base.ntotal

    def index_data(self, ids, embeddings: np.ndarray) -> None:
        embeddings = np.asarray(embeddings, np.float32)
        self.base.index_data(ids, embeddings)
        self._orig_chunks.append(embeddings.astype(self.store_dtype))
        self._originals = None

    def set_originals(self, embeddings: np.ndarray) -> None:
        """Attach originals to an ALREADY-BUILT base index (bench/sweep
        convenience; the normal path is index_data)."""
        if len(embeddings) != self.base.ntotal:
            raise ValueError(f"{len(embeddings)} originals vs "
                             f"{self.base.ntotal} indexed rows")
        self._orig_chunks = [np.asarray(embeddings).astype(self.store_dtype)]
        self._originals = None

    def _build_originals(self) -> np.ndarray:
        if self._originals is None:
            if not self._orig_chunks:
                raise ValueError("index is empty")
            self._originals = np.concatenate(self._orig_chunks, axis=0)
            self._orig_chunks = [self._originals]
        return self._originals

    # -- search --------------------------------------------------------------
    def search_rows(self, query_vectors: np.ndarray, k: int,
                    index_batch_size: Optional[int] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
        orig = self._build_originals()
        queries = np.asarray(query_vectors, np.float32)
        k = min(k, self.ntotal)
        R = min(self.refine_factor * k, self.ntotal)
        cv, ci = self.base.search_rows(queries, R, index_batch_size)
        # exact rescore of the candidates (host BLAS batched matmul);
        # -inf base slots (IVF under-filled unions) stay -inf so they
        # can never enter the refined top-k
        cand = orig[ci].astype(np.float32)              # [Q, R', D]
        exact = np.matmul(cand, queries[:, :, None])[..., 0]  # [Q, R']
        exact = np.where(np.isfinite(cv), exact, NEG_INF)
        kk = min(k, exact.shape[1])
        sel = np.argpartition(-exact, kk - 1, axis=1)[:, :kk]
        sv = np.take_along_axis(exact, sel, axis=1)
        si = np.take_along_axis(ci, sel, axis=1)
        order = np.argsort(-sv, axis=1, kind="stable")
        return (np.take_along_axis(sv, order, axis=1),
                np.take_along_axis(si, order, axis=1))

    def search_knn(self, query_vectors: np.ndarray, top_docs: int,
                   index_batch_size: Optional[int] = None
                   ) -> List[Tuple[List[str], List[float]]]:
        v, i = self.search_rows(query_vectors, top_docs, index_batch_size)
        id_arr = np.asarray([str(x) for x in self.index_id_to_db_id],
                            dtype=object)
        out: List[Tuple[List[str], List[float]]] = []
        for row_ids, row_v in zip(id_arr[i], v):
            n_ok = int(np.sum(np.isfinite(row_v)))
            out.append((list(row_ids[:n_ok]), row_v[:n_ok].tolist()))
        return out

    # -- persistence ---------------------------------------------------------
    def serialize(self, dir_path: str) -> None:
        import os
        self.base.serialize(dir_path)
        np.save(os.path.join(dir_path, "originals.npy"),
                self._build_originals().view(np.uint16)
                if self.store_dtype == _BF16 else self._build_originals())
        import json
        with open(os.path.join(dir_path, "refine_config.json"), "w") as f:
            json.dump({"refine_factor": self.refine_factor,
                       "store_dtype": self.store_dtype.name}, f)

    def deserialize_from(self, dir_path: str) -> None:
        import json
        import os
        self.base.deserialize_from(dir_path)
        with open(os.path.join(dir_path, "refine_config.json")) as f:
            rc = json.load(f)
        self.refine_factor = rc["refine_factor"]
        raw = np.load(os.path.join(dir_path, "originals.npy"))
        if rc["store_dtype"] == "bfloat16":
            raw = raw.view(_BF16)
        self._orig_chunks = [raw]
        self._originals = None

    def memory_bytes(self) -> int:
        """Base index + the original store (BASELINE.md equal-memory
        accounting — refinement is NOT free memory)."""
        return (self.base.memory_bytes()
                + self._build_originals().nbytes)
