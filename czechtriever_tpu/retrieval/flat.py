"""On-device sharded flat inner-product index.

TPU-native replacement for the reference's FAISS ``IndexFlatIP`` wrapper
(/root/reference/src/index.py:15-73), API-compatible: ``index_data``,
``search_knn`` (returning per-query (external-id list, score list)),
``serialize`` / ``deserialize_from``.

Architecture: corpus embeddings live in HBM as one [N_pad, D] array,
sharded over the mesh ``data`` axis (row-wise). Search runs under
``shard_map``: each device streams its shard through a fused
score+top-k engine (ops/topk.py — Pallas on TPU, XLA scan elsewhere),
local candidates are all-gathered over ICI and reduced with a final
top-k. No [Q, N] scores, no host round-trip per block, and corpus reads
scale linearly with device count.
"""

from __future__ import annotations

import functools
import json
import os
import pickle
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from czechtriever_tpu.ops import topk as topk_ops
from czechtriever_tpu.parallel.mesh import DATA_AXIS


def _default_engine() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "blocked"


@functools.partial(jax.jit, static_argnames=("k", "engine", "mesh"))
def _sharded_search(queries, corpus, n_valid, k: int, engine: str,
                    mesh: Optional[Mesh]):
    """corpus: [ws*rows, D] sharded over DATA_AXIS (replicated if mesh is
    None); n_valid: global count of real rows."""
    fn = topk_ops.pallas_topk if engine == "pallas" else topk_ops.blocked_topk

    if mesh is None:
        return fn(queries, corpus, k, n_valid=n_valid)

    ws = mesh.shape[DATA_AXIS]
    rows = corpus.shape[0] // ws

    def local_search(q, c_shard, nv):
        r = jax.lax.axis_index(DATA_AXIS) * rows
        local_valid = jnp.clip(nv[0] - r, 0, rows)
        v, i = fn(q, c_shard, k, n_valid=local_valid)
        i = i + r
        vg = jax.lax.all_gather(v, DATA_AXIS)   # [ws, Q, k]
        ig = jax.lax.all_gather(i, DATA_AXIS)
        Q = q.shape[0]
        vg = jnp.swapaxes(vg, 0, 1).reshape(Q, ws * k)
        ig = jnp.swapaxes(ig, 0, 1).reshape(Q, ws * k)
        fv, sel = jax.lax.top_k(vg, k)
        fi = jnp.take_along_axis(ig, sel, axis=1)
        return fv, fi

    # check_vma=False: the engines' scan carries start replicated and
    # become device-varying, which the varying-axes checker rejects.
    return jax.shard_map(
        local_search, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, corpus, jnp.asarray(n_valid, jnp.int32).reshape(1))


class FlatIndex:
    """Exact MIPS index over device HBM (reference Indexer flat mode,
    src/index.py:21)."""

    def __init__(self, vector_sz: int, mesh: Optional[Mesh] = None,
                 engine: Optional[str] = None, dtype: str = "float32",
                 query_batch: int = 2048):
        self.vector_sz = vector_sz
        self.mesh = mesh
        self.engine = engine or _default_engine()
        self.dtype = dtype
        self.query_batch = query_batch
        self.index_id_to_db_id: List = []
        self._chunks: List[np.ndarray] = []
        self._corpus = None      # device array [N_pad, D]
        self._id_arr = None      # str id lookup table, built lazily
        self._n = 0

    # -- build -------------------------------------------------------------
    def index_data(self, ids: List, embeddings: np.ndarray) -> None:
        """Append a batch of (external ids, [n, D] embeddings)."""
        assert embeddings.shape[1] == self.vector_sz
        self.index_id_to_db_id.extend(ids)
        self._chunks.append(np.asarray(embeddings, dtype=np.float32))
        self._corpus = None  # invalidate device copy
        self._id_arr = None

    @property
    def ntotal(self) -> int:
        return len(self.index_id_to_db_id)

    def _build(self):
        if self._corpus is not None:
            return
        if not self._chunks:
            raise ValueError("index is empty")
        corpus = np.concatenate(self._chunks, axis=0)
        self._chunks = [corpus]
        self._n = corpus.shape[0]
        ws = self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1
        # pad on the HOST to a block multiple per shard (4096 covers both
        # engines' default block sizes): a device-side _pad_corpus
        # concatenate would briefly hold TWO copies of the corpus in HBM,
        # which OOMs exactly at the capacity boundary this index exists
        # for (observed at 8M x 768 bf16 = 11.5 of 16 GB)
        pad = (-self._n) % (ws * 4096)
        if pad:
            corpus = np.concatenate(
                [corpus, np.zeros((pad, self.vector_sz), np.float32)], axis=0)
        # dtype conversion must happen on the HOST: jnp.asarray(f32,
        # dtype=bf16) stages a second copy on device before converting,
        # which OOMs at the capacity boundary (observed at 8M x 768:
        # ResourceExhausted with only the 11.45 GB corpus live)
        host = corpus.astype(jnp.dtype(self.dtype), copy=False)
        if self.mesh is not None:
            arr = jax.device_put(
                host, NamedSharding(self.mesh, P(DATA_AXIS, None)))
        else:
            arr = jax.device_put(host)
        self._corpus = arr

    # -- search ------------------------------------------------------------
    def search_knn(self, query_vectors: np.ndarray, top_docs: int,
                   index_batch_size: Optional[int] = None
                   ) -> List[Tuple[List[str], List[float]]]:
        """Batched exact search; returns [(external_ids, scores)] per
        query (src/index.py:34-46 contract — ids are str)."""
        self._build()
        bs = index_batch_size or self.query_batch
        queries = np.asarray(query_vectors, dtype=np.float32)
        nq = len(queries)
        k = min(top_docs, self._n)
        result: List[Tuple[List[str], List[float]]] = []
        for s in range(0, nq, bs):
            q = queries[s:s + bs]
            n_real = len(q)
            if n_real < bs and nq > bs:
                # pad the last partial batch to the steady-state shape so
                # the jitted search compiles once
                q = np.concatenate([q, np.zeros((bs - n_real, q.shape[1]),
                                                np.float32)], axis=0)
            v, i = _sharded_search(jnp.asarray(q), self._corpus, self._n,
                                   k, self.engine, self.mesh)
            v = np.asarray(v)[:n_real]
            i = np.asarray(i)[:n_real]
            if self._id_arr is None:
                self._id_arr = np.asarray(
                    [str(x) for x in self.index_id_to_db_id], dtype=object)
            ids_block = self._id_arr[i]  # vectorized id lookup
            for row_i, row_v in zip(ids_block, v):
                result.append((list(row_i), row_v.tolist()))
        return result

    # -- persistence (src/index.py:48-68) -----------------------------------
    def serialize(self, dir_path: str) -> None:
        os.makedirs(dir_path, exist_ok=True)
        self._build()
        np.save(os.path.join(dir_path, "index.npy"),
                np.concatenate(self._chunks, axis=0))
        with open(os.path.join(dir_path, "index_meta.pkl"), "wb") as f:
            pickle.dump(self.index_id_to_db_id, f)
        with open(os.path.join(dir_path, "index_config.json"), "w") as f:
            json.dump({"type": "flat", "vector_sz": self.vector_sz,
                       "dtype": self.dtype}, f)

    def deserialize_from(self, dir_path: str) -> None:
        corpus = np.load(os.path.join(dir_path, "index.npy"))
        with open(os.path.join(dir_path, "index_meta.pkl"), "rb") as f:
            self.index_id_to_db_id = pickle.load(f)
        assert len(self.index_id_to_db_id) == corpus.shape[0], (
            "deserialized id map must match index size")
        self._chunks = [corpus.astype(np.float32)]
        self._corpus = None
