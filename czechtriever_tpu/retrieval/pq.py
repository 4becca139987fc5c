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

from czechtriever_tpu.ops import kmeans as kmeans_ops

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


@functools.partial(jax.jit, static_argnames=("k", "block"))
def adc_search(queries: jnp.ndarray, codes: jnp.ndarray,
               codebooks: jnp.ndarray, k: int, n_valid=None,
               block: int = 8192) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ADC top-k: queries [Q, D], codes [N, m] uint8,
    codebooks [m, ksub, dsub]."""
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
    return v, i


class PQIndex:
    """Compressed MIPS index (FAISS IndexPQ parity)."""

    def __init__(self, vector_sz: int, n_subquantizers: int, n_bits: int = 8,
                 kmeans_iters: int = 25, seed: int = 0,
                 query_batch: int = 2048):
        assert vector_sz % n_subquantizers == 0
        assert n_bits <= 8, "codes are stored as uint8"
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
            self._codes = jnp.asarray(all_codes)
        return self._codes

    def search_knn(self, query_vectors: np.ndarray, top_docs: int,
                   index_batch_size: Optional[int] = None
                   ) -> List[Tuple[List[str], List[float]]]:
        codes = self._build()
        bs = index_batch_size or self.query_batch
        queries = np.asarray(query_vectors, np.float32)
        nq = len(queries)
        k = min(top_docs, self.ntotal)
        out: List[Tuple[List[str], List[float]]] = []
        id_arr = np.asarray([str(x) for x in self.index_id_to_db_id],
                            dtype=object)
        for s in range(0, nq, bs):
            q = queries[s:s + bs]
            n_real = len(q)
            if n_real < bs and nq > bs:
                q = np.concatenate(
                    [q, np.zeros((bs - n_real, q.shape[1]), np.float32)])
            v, i = adc_search(jnp.asarray(q), codes, self.codebooks, k,
                              n_valid=self.ntotal)
            ids_block = id_arr[np.asarray(i)[:n_real]]
            for row_ids, row_v in zip(ids_block, np.asarray(v)[:n_real]):
                out.append((list(row_ids), row_v.tolist()))
        return out

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
