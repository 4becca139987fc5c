"""Product-quantized inner-product index (PQ ADC).

TPU-native replacement for FAISS ``IndexPQ(vector_sz, m, n_bits,
METRIC_INNER_PRODUCT)`` (/root/reference/src/index.py:19), same API
surface as FlatIndex. Semantics match FAISS:

  * train: per-subspace k-means with 2^n_bits centroids over the first
    ``index_data`` batch (reference trains on the first batch,
    src/index.py:28-29); codes assign by L2 reconstruction error.
  * search: asymmetric distance — score(q, x) = sum_m <q_m, C_m[code_m]>,
    computed from a per-query LUT [m, 2^bits] built with one einsum, then
    a blocked LUT-gather-sum over the uint8 code matrix with a running
    top-k merge.

Index memory is m bytes/vector (n_bits=8) vs 4*D for flat — the
equal-memory axis for the FAISS-parity benchmark (BASELINE.md).
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

from czechtriever_tpu.ops import kmeans as kmeans_ops
from czechtriever_tpu.parallel.mesh import DATA_AXIS

NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnames=("ksub",))
def encode_codes(data: jnp.ndarray, codebooks: jnp.ndarray, ksub: int
                 ) -> jnp.ndarray:
    """data [N, D], codebooks [m, ksub, dsub] -> codes [N, m] uint8.
    Assignment minimizes L2 reconstruction error per subspace."""
    m, _, dsub = codebooks.shape
    N = data.shape[0]
    sub = data.reshape(N, m, dsub)

    def per_sub(x_m, cb_m):  # [N, dsub], [ksub, dsub]
        c_norm = jnp.sum(cb_m ** 2, axis=1)
        prod = jnp.dot(x_m.astype(jnp.float32), cb_m.T,
                       preferred_element_type=jnp.float32)
        return jnp.argmin(c_norm[None, :] - 2.0 * prod, axis=1)

    codes = jax.vmap(per_sub, in_axes=(1, 0), out_axes=1)(sub, codebooks)
    return codes.astype(jnp.uint8)


def _adc_core(queries: jnp.ndarray, codes: jnp.ndarray,
              codebooks: jnp.ndarray, k: int, n_valid=None,
              block: int = 8192, row_offset=0
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ADC top-k: queries [Q, D], codes [N, m] uint8,
    codebooks [m, ksub, dsub]. ``row_offset`` shifts the returned row
    ids (sharded search: each device scans its own row shard but must
    report global ids)."""
    Q, D = queries.shape
    N, m = codes.shape
    ksub = codebooks.shape[1]
    dsub = D // m
    if n_valid is None:
        n_valid = N
    k = min(k, N)

    # LUT[q, m, c] = <q_m, C_m[c]>
    qsub = queries.reshape(Q, m, dsub).astype(jnp.float32)
    lut = jnp.einsum("qmd,mcd->mcq", qsub, codebooks.astype(jnp.float32))
    # [m, ksub, Q] layout so the gather below indexes leading axes

    pad = (-N) % block
    codes_p = jnp.pad(codes, ((0, pad), (0, 0)))
    code_blocks = codes_p.reshape(-1, block, m)
    sub_ids = jnp.arange(m, dtype=jnp.int32)

    def body(carry, xs):
        run_v, run_i = carry
        blk, b = xs  # [block, m] uint8
        # gathered[m, n, q] = lut[m, blk[n, m], q]
        gathered = lut[sub_ids[:, None], blk.T.astype(jnp.int32), :]
        scores = gathered.sum(axis=0).T  # [Q, block]
        idx = b * block + jax.lax.broadcasted_iota(jnp.int32, (Q, block), 1)
        scores = jnp.where(idx < n_valid, scores, NEG_INF)
        cat_v = jnp.concatenate([run_v, scores], axis=1)
        cat_i = jnp.concatenate([run_i, idx], axis=1)
        v, sel = jax.lax.top_k(cat_v, k)
        return (v, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (jnp.full((Q, k), NEG_INF), jnp.zeros((Q, k), jnp.int32))
    (v, i), _ = jax.lax.scan(
        body, init,
        (code_blocks, jnp.arange(code_blocks.shape[0], dtype=jnp.int32)))
    return v, i + row_offset


adc_search = jax.jit(_adc_core, static_argnames=("k", "block"))


@functools.partial(jax.jit, static_argnames=("k", "block", "mesh"))
def sharded_adc_search(queries, codes, codebooks, n_valid, k: int,
                       mesh: Optional[Mesh], block: int = 8192
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ADC top-k over codes row-sharded on the mesh ``data`` axis — the
    exact structure of the sharded flat engine (retrieval/flat.py
    _sharded_search): per-shard blocked ADC scan with global-id offsets,
    all-gather of the k local candidates over ICI, final top-k merge.
    Exactness vs the single-device scan is pinned in tests/test_pq.py.
    codes [ws*rows, m]; n_valid: global count of real rows."""
    if mesh is None:
        return _adc_core(queries, codes, codebooks, k, n_valid, block)
    ws = mesh.shape[DATA_AXIS]
    rows = codes.shape[0] // ws
    k = min(k, rows)

    def local_search(q, c_shard, cb, nv):
        r = jax.lax.axis_index(DATA_AXIS) * rows
        local_valid = jnp.clip(nv[0] - r, 0, rows)
        v, i = _adc_core(q, c_shard, cb, k, n_valid=local_valid,
                         block=block, row_offset=r)
        vg = jax.lax.all_gather(v, DATA_AXIS)   # [ws, Q, k]
        ig = jax.lax.all_gather(i, DATA_AXIS)
        Q = q.shape[0]
        vg = jnp.swapaxes(vg, 0, 1).reshape(Q, ws * k)
        ig = jnp.swapaxes(ig, 0, 1).reshape(Q, ws * k)
        fv, sel = jax.lax.top_k(vg, k)
        return fv, jnp.take_along_axis(ig, sel, axis=1)

    return jax.shard_map(
        local_search, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, codes, codebooks,
      jnp.asarray(n_valid, jnp.int32).reshape(1))


class PQIndex:
    """Compressed MIPS index (FAISS IndexPQ parity)."""

    def __init__(self, vector_sz: int, n_subquantizers: int, n_bits: int = 8,
                 kmeans_iters: int = 25, seed: int = 0,
                 query_batch: int = 2048, mesh: Optional[Mesh] = None):
        assert vector_sz % n_subquantizers == 0
        assert n_bits <= 8, "codes are stored as uint8"
        self.mesh = mesh
        self.vector_sz = vector_sz
        self.m = n_subquantizers
        self.n_bits = n_bits
        self.ksub = 2 ** n_bits
        self.dsub = vector_sz // n_subquantizers
        self.kmeans_iters = kmeans_iters
        self.seed = seed
        self.query_batch = query_batch
        self.index_id_to_db_id: List = []
        self.codebooks: Optional[jnp.ndarray] = None  # [m, ksub, dsub]
        self._code_chunks: List[np.ndarray] = []
        self._codes = None

    @property
    def is_trained(self) -> bool:
        return self.codebooks is not None

    @property
    def ntotal(self) -> int:
        return len(self.index_id_to_db_id)

    def train(self, embeddings: np.ndarray) -> None:
        data = jnp.asarray(embeddings, jnp.float32)
        N = data.shape[0]
        sub = data.reshape(N, self.m, self.dsub)
        rngs = jax.random.split(jax.random.key(self.seed), self.m)
        cbs = []
        for j in range(self.m):
            cb, _ = kmeans_ops.kmeans(rngs[j], sub[:, j, :], self.ksub,
                                      self.kmeans_iters)
            cbs.append(cb)
        self.codebooks = jnp.stack(cbs, axis=0)

    def index_data(self, ids: List, embeddings: np.ndarray) -> None:
        """Train on first batch (reference semantics) then encode+add."""
        embeddings = np.asarray(embeddings, np.float32)
        if not self.is_trained:
            self.train(embeddings)
        self.index_id_to_db_id.extend(ids)
        codes = encode_codes(jnp.asarray(embeddings), self.codebooks,
                             self.ksub)
        self._code_chunks.append(np.asarray(codes))
        self._codes = None

    def _build(self):
        if self._codes is None:
            if not self._code_chunks:
                raise ValueError("index is empty")
            all_codes = np.concatenate(self._code_chunks, axis=0)
            self._code_chunks = [all_codes]
            if self.mesh is not None:
                # host-pad to a per-shard block multiple and row-shard
                # over the data axis (the flat engine's layout,
                # retrieval/flat.py _build — same OOM-safety reasoning)
                ws = self.mesh.shape[DATA_AXIS]
                pad = (-all_codes.shape[0]) % (ws * 8192)
                if pad:
                    all_codes = np.concatenate(
                        [all_codes,
                         np.zeros((pad, self.m), np.uint8)], axis=0)
                self._codes = jax.device_put(
                    all_codes,
                    NamedSharding(self.mesh, P(DATA_AXIS, None)))
            else:
                self._codes = jnp.asarray(all_codes)
        return self._codes

    def search_rows(self, query_vectors: np.ndarray, k: int,
                    index_batch_size: Optional[int] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Raw top-k: (scores [Q, k], internal row ids [Q, k]). The
        refine stage (retrieval/refine.py) consumes rows, not str ids."""
        codes = self._build()
        bs = index_batch_size or self.query_batch
        queries = np.asarray(query_vectors, np.float32)
        nq = len(queries)
        k = min(k, self.ntotal)
        vs, is_ = [], []
        for s in range(0, nq, bs):
            q = queries[s:s + bs]
            n_real = len(q)
            if n_real < bs and nq > bs:
                q = np.concatenate(
                    [q, np.zeros((bs - n_real, q.shape[1]), np.float32)])
            v, i = sharded_adc_search(jnp.asarray(q), codes,
                                      self.codebooks, self.ntotal, k,
                                      self.mesh)
            vs.append(np.asarray(v)[:n_real])
            is_.append(np.asarray(i)[:n_real])
        return np.concatenate(vs), np.concatenate(is_)

    def search_knn(self, query_vectors: np.ndarray, top_docs: int,
                   index_batch_size: Optional[int] = None
                   ) -> List[Tuple[List[str], List[float]]]:
        v, i = self.search_rows(query_vectors, top_docs, index_batch_size)
        id_arr = np.asarray([str(x) for x in self.index_id_to_db_id],
                            dtype=object)
        return [(list(row_ids), row_v.tolist())
                for row_ids, row_v in zip(id_arr[i], v)]

    def reconstruct(self, idx: np.ndarray) -> np.ndarray:
        """Decode vectors from codes (for diagnostics)."""
        codes = np.asarray(self._build())[idx]          # [n, m]
        cbs = np.asarray(self.codebooks)                # [m, ksub, dsub]
        return np.concatenate(
            [cbs[j, codes[:, j]] for j in range(self.m)], axis=1)

    # -- persistence --------------------------------------------------------
    def serialize(self, dir_path: str) -> None:
        os.makedirs(dir_path, exist_ok=True)
        codes = np.asarray(self._build())
        np.savez(os.path.join(dir_path, "index_pq.npz"),
                 codes=codes, codebooks=np.asarray(self.codebooks))
        with open(os.path.join(dir_path, "index_meta.pkl"), "wb") as f:
            pickle.dump(self.index_id_to_db_id, f)
        with open(os.path.join(dir_path, "index_config.json"), "w") as f:
            json.dump({"type": "pq", "vector_sz": self.vector_sz,
                       "m": self.m, "n_bits": self.n_bits}, f)

    def deserialize_from(self, dir_path: str) -> None:
        with np.load(os.path.join(dir_path, "index_pq.npz")) as z:
            codes, cbs = z["codes"], z["codebooks"]
        with open(os.path.join(dir_path, "index_meta.pkl"), "rb") as f:
            self.index_id_to_db_id = pickle.load(f)
        assert len(self.index_id_to_db_id) == codes.shape[0]
        self.codebooks = jnp.asarray(cbs)
        self._code_chunks = [codes]
        self._codes = None

    def memory_bytes(self) -> int:
        """Code storage (the equal-memory comparison axis vs flat)."""
        return self.ntotal * self.m * self.n_bits // 8
