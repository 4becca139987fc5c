"""IVF-PQ: inverted-file index with product-quantized residuals.

The reference stops at FAISS ``IndexPQ`` (exhaustive ADC scan,
/root/reference/src/index.py:19); SURVEY.md §2.4 names IVF-PQ as the
TPU-native replacement target for large corpora. This implements it
on-device:

  * **coarse quantizer** — k-means over ``nlist`` centroids
    (ops/kmeans, MXU-shaped Lloyd's);
  * **residual PQ** — per-subspace codebooks trained on x - centroid
    (reusing the PQ machinery from retrieval/pq.py);
  * **inverted lists** — a dense [nlist, C, m] uint8 code tensor padded
    to the longest list (static shapes; per-list fill counts mask the
    tail), plus an id map [nlist, C];
  * **search** — one jitted program per query batch: coarse scores on
    the MXU -> top-``nprobe`` lists -> gather probed code blocks ->
    per-query ADC LUT lookups -> masked top-k. Final score =
    q.centroid + q.residual (exact ADC inner product).

List probing selects by the L2-compatible score q.c - ||c||^2/2 (the
coarse assignment is L2 k-means), while the returned scores use the
inner product to match the flat/PQ indexes.
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
from czechtriever_tpu.retrieval import pq as pq_mod

NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "q_block",
                                             "probe_chunk"))
def ivf_adc_search(queries: jnp.ndarray, centroids: jnp.ndarray,
                   codes: jnp.ndarray, ids_map: jnp.ndarray,
                   home_map: jnp.ndarray, list_sizes: jnp.ndarray,
                   codebooks: jnp.ndarray, k: int, nprobe: int,
                   q_block: int = 32, probe_chunk: int = 8
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """queries [Q, D]; centroids [nlist, D]; codes [nlist, C, m] uint8;
    ids_map [nlist, C] int32 (row index into the global id list);
    home_map [nlist, C] int32 — the centroid each slot's PQ residual was
    encoded against (== the list index except for capacity-spilled items,
    see IVFPQIndex._build); list_sizes [nlist]; codebooks [m, ksub, dsub].
    Returns (scores [Q, k], global row ids [Q, k]).

    Probed lists are consumed ``probe_chunk`` at a time under a scan
    with a running top-k: the gather temporaries are [q_block,
    probe_chunk, C, m] rather than all of nprobe at once — at 1M rows /
    nprobe 64 the all-at-once form peaked >4 GB of gather/cast buffers
    and crashed the TPU worker."""
    Q, D = queries.shape
    nlist, C, m = codes.shape
    ksub = codebooks.shape[1]
    dsub = D // m
    k = min(k, nprobe * C)

    q32 = queries.astype(jnp.float32)
    c32 = centroids.astype(jnp.float32)
    ip = jnp.dot(q32, c32.T, preferred_element_type=jnp.float32)  # q.c
    sel_score = ip - 0.5 * jnp.sum(c32 * c32, axis=1)[None, :]
    _, probe_i = jax.lax.top_k(sel_score, nprobe)        # [Q, nprobe]

    # per-query ADC LUT over the residual codebooks: [Q, m, ksub]
    qsub = q32.reshape(Q, m, dsub)
    lut = jnp.einsum("qmd,mcd->qmc", qsub, codebooks.astype(jnp.float32))
    lut_flat = lut.reshape(Q, m * ksub)
    offsets = (jnp.arange(m, dtype=jnp.int32) * ksub)[None, None, :]

    pad_p = (-nprobe) % probe_chunk
    # pad with repeats of the last probed list, masked invalid below so
    # the duplicates can never enter the top-k
    probe_valid = jnp.ones((Q, nprobe), bool)
    if pad_p:
        probe_i = jnp.concatenate(
            [probe_i, jnp.repeat(probe_i[:, -1:], pad_p, axis=1)], axis=1)
        probe_valid = jnp.pad(probe_valid, ((0, 0), (0, pad_p)))
    npc = probe_i.shape[1] // probe_chunk

    pad_q = (-Q) % q_block

    def block_fn(args):
        # [qb, nprobe+], [qb, nprobe+], [qb, nlist], [qb, m*ksub]
        qi, qpv, qip_full, qlut = args
        qb = qi.shape[0]

        def probe_body(carry, xs):
            run_v, run_i = carry
            pi, pv = xs  # [qb, probe_chunk] each
            gathered = codes[pi]              # [qb, pc, C, m]
            idx = gathered.astype(jnp.int32) + offsets[None]

            def per_q(lf, ix):
                return jnp.take(lf, ix).sum(axis=-1)  # [pc, C]

            res = jax.vmap(per_q)(qlut, idx)          # [qb, pc, C]
            # score = q . c_home + q . residual — exact ADC inner
            # product even for spilled slots stored under a
            # neighboring centroid
            home = home_map[pi]                       # [qb, pc, C]
            ip_home = jax.vmap(jnp.take)(qip_full, home)
            total = ip_home + res
            valid = (jax.lax.broadcasted_iota(
                jnp.int32, (C,), 0)[None, None, :]
                < list_sizes[pi][:, :, None]) & pv[:, :, None]
            total = jnp.where(valid, total, NEG_INF)
            rows = ids_map[pi]                        # [qb, pc, C]
            cat_v = jnp.concatenate(
                [run_v, total.reshape(qb, -1)], axis=1)
            cat_i = jnp.concatenate(
                [run_i, rows.reshape(qb, -1)], axis=1)
            v, sel = jax.lax.top_k(cat_v, k)
            return (v, jnp.take_along_axis(cat_i, sel, axis=1)), None

        init = (jnp.full((qb, k), NEG_INF),
                jnp.zeros((qb, k), jnp.int32))
        (v, i), _ = jax.lax.scan(
            probe_body, init,
            (jnp.moveaxis(qi.reshape(qb, npc, probe_chunk), 1, 0),
             jnp.moveaxis(qpv.reshape(qb, npc, probe_chunk), 1, 0)))
        return v, i

    if pad_q:
        probe_i = jnp.pad(probe_i, ((0, pad_q), (0, 0)))
        probe_valid = jnp.pad(probe_valid, ((0, pad_q), (0, 0)))
        ip = jnp.pad(ip, ((0, pad_q), (0, 0)))
        lut_flat = jnp.pad(lut_flat, ((0, pad_q), (0, 0)))
    nb = probe_i.shape[0] // q_block

    def scan_body(_, xs):
        return None, block_fn(xs)

    _, (v, i) = jax.lax.scan(
        scan_body, None,
        (probe_i.reshape(nb, q_block, -1),
         probe_valid.reshape(nb, q_block, -1),
         ip.reshape(nb, q_block, -1),
         lut_flat.reshape(nb, q_block, -1)))
    return v.reshape(-1, k)[:Q], i.reshape(-1, k)[:Q]


class IVFPQIndex:
    """Inverted-file PQ index with the same external contract as
    FlatIndex/PQIndex (index_data / search_knn / serialize)."""

    def __init__(self, vector_sz: int, n_subquantizers: int,
                 n_bits: int = 8, nlist: int = 256, nprobe: int = 8,
                 train_iters: int = 20, seed: int = 0,
                 query_batch: int = 1024):
        assert vector_sz % n_subquantizers == 0
        self.vector_sz = vector_sz
        self.m = n_subquantizers
        self.n_bits = n_bits
        self.ksub = 2 ** n_bits
        self.nlist = nlist
        self.nprobe = nprobe
        self.train_iters = train_iters
        self.seed = seed
        self.query_batch = query_batch
        self.centroids: Optional[np.ndarray] = None   # [nlist, D]
        self.codebooks: Optional[np.ndarray] = None   # [m, ksub, dsub]
        self.index_id_to_db_id: List = []
        self._assign_chunks: List[np.ndarray] = []
        self._code_chunks: List[np.ndarray] = []
        self._packed = None  # (codes, ids_map, list_sizes) device arrays

    @property
    def is_trained(self) -> bool:
        return self.codebooks is not None

    @property
    def ntotal(self) -> int:
        return len(self.index_id_to_db_id)

    # -- build ---------------------------------------------------------------
    def train(self, embeddings: np.ndarray) -> None:
        """Coarse k-means + residual PQ codebooks (trained on the first
        batch, like the reference's PQ path, src/index.py:29)."""
        x = jnp.asarray(embeddings, jnp.float32)
        if len(embeddings) < self.nlist:
            # k-means needs k <= n; shrink like FAISS warns+clamps
            self.nlist = max(1, len(embeddings))
        rng = jax.random.key(self.seed)
        cents, _ = kmeans_ops.kmeans(rng, x, self.nlist,
                                     iters=self.train_iters)
        self.centroids = np.asarray(cents)
        assign = np.asarray(kmeans_ops.assign(x, cents))
        residuals = np.asarray(x) - self.centroids[assign]
        helper = pq_mod.PQIndex(self.vector_sz, self.m, self.n_bits,
                                seed=self.seed + 1)
        helper.train(residuals)
        self.codebooks = np.asarray(helper.codebooks)

    def index_data(self, ids: List, embeddings: np.ndarray) -> None:
        embeddings = np.asarray(embeddings, np.float32)
        if not self.is_trained:
            self.train(embeddings)
        assign = np.asarray(kmeans_ops.assign(
            jnp.asarray(embeddings), jnp.asarray(self.centroids)))
        residuals = embeddings - self.centroids[assign]
        codes = np.asarray(pq_mod.encode_codes(
            jnp.asarray(residuals), jnp.asarray(self.codebooks), self.ksub))
        self.index_id_to_db_id.extend(ids)
        self._assign_chunks.append(assign)
        self._code_chunks.append(codes)
        self._packed = None

    def _build(self):
        """Pack the inverted lists into a dense [nlist, C, m] tensor.

        C is capped at 4x the pigeonhole minimum ceil(N/nlist)
        (lane-padded), NOT the max list size: one hot centroid must not
        blow the tensor up to [nlist, ~N, m] on skewed data. The cap
        bounds total slots at <= ~4N while leaving balanced assignments
        (max list ~2x mean) untouched.
        Items overflowing a full list "spill" to the nearest centroid
        (by centroid-centroid distance from their home) that still has
        space. Spilled slots keep their PQ residual vs the HOME centroid
        and record it in ``home_map``, so the ADC score computed at
        search time (q.c_home + q.residual) stays exact — the spill only
        affects which queries *probe* the item, i.e. recall, never the
        reported score.
        """
        if self._packed is not None:
            return self._packed
        assign = np.concatenate(self._assign_chunks)
        codes = np.concatenate(self._code_chunks)
        N = len(assign)
        sizes = np.bincount(assign, minlength=self.nlist)
        cap = max(4 * (-(-N // self.nlist)), 1)         # 4x pigeonhole
        C = min(max(int(sizes.max()), 1), cap)
        C = -(-C // 128) * 128                          # lane-pad
        capped = np.minimum(sizes, C)
        packed_codes = np.zeros((self.nlist, C, self.m), np.uint8)
        ids_map = np.zeros((self.nlist, C), np.int32)
        home_map = np.zeros((self.nlist, C), np.int32)
        fill = np.zeros(self.nlist, np.int64)

        order = np.argsort(assign, kind="stable")
        start = 0
        spilled_rows: List[np.ndarray] = []
        for li in range(self.nlist):
            n = int(sizes[li])
            rows = order[start:start + n]
            keep = int(capped[li])
            packed_codes[li, :keep] = codes[rows[:keep]]
            ids_map[li, :keep] = rows[:keep]
            home_map[li, :keep] = li
            fill[li] = keep
            if n > keep:
                spilled_rows.append(rows[keep:])
            start += n

        if spilled_rows:
            spill = np.concatenate(spilled_rows)
            # neighbor order by centroid-centroid L2 (a proxy for "lists
            # a query probing the home list would also probe")
            c = self.centroids
            d2 = (np.sum(c * c, axis=1)[:, None]
                  - 2.0 * (c @ c.T) + np.sum(c * c, axis=1)[None, :])
            neighbor_order = np.argsort(d2, axis=1)
            for row in spill:
                home = int(assign[row])
                for cand in neighbor_order[home]:
                    if fill[cand] < C:
                        slot = int(fill[cand])
                        packed_codes[cand, slot] = codes[row]
                        ids_map[cand, slot] = row
                        home_map[cand, slot] = home
                        fill[cand] += 1
                        break
                else:  # pragma: no cover — impossible: nlist*C >= N
                    raise RuntimeError("no spill capacity left")

        self._packed = (jnp.asarray(packed_codes), jnp.asarray(ids_map),
                        jnp.asarray(home_map),
                        jnp.asarray(fill.astype(np.int32)))
        return self._packed

    # -- search ----------------------------------------------------------------
    def search_knn(self, query_vectors: np.ndarray, top_docs: int,
                   index_batch_size: Optional[int] = None
                   ) -> List[Tuple[List[str], List[float]]]:
        codes, ids_map, home_map, sizes = self._build()
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
            v, i = ivf_adc_search(
                jnp.asarray(q), jnp.asarray(self.centroids), codes,
                ids_map, home_map, sizes, jnp.asarray(self.codebooks), k,
                min(self.nprobe, self.nlist))
            ids_block = id_arr[np.asarray(i)[:n_real]]
            for row_ids, row_v in zip(ids_block, np.asarray(v)[:n_real]):
                out.append((list(row_ids), row_v.tolist()))
        return out

    # -- persistence -----------------------------------------------------------
    def serialize(self, dir_path: str) -> None:
        os.makedirs(dir_path, exist_ok=True)
        np.save(os.path.join(dir_path, "centroids.npy"), self.centroids)
        np.save(os.path.join(dir_path, "codebooks.npy"), self.codebooks)
        np.save(os.path.join(dir_path, "assign.npy"),
                np.concatenate(self._assign_chunks))
        np.save(os.path.join(dir_path, "codes.npy"),
                np.concatenate(self._code_chunks))
        with open(os.path.join(dir_path, "index_meta.pkl"), "wb") as f:
            pickle.dump(self.index_id_to_db_id, f)
        with open(os.path.join(dir_path, "index_config.json"), "w") as f:
            json.dump({"type": "ivfpq", "vector_sz": self.vector_sz,
                       "m": self.m, "n_bits": self.n_bits,
                       "nlist": self.nlist, "nprobe": self.nprobe}, f)

    def deserialize_from(self, dir_path: str) -> None:
        self.centroids = np.load(os.path.join(dir_path, "centroids.npy"))
        self.codebooks = np.load(os.path.join(dir_path, "codebooks.npy"))
        self._assign_chunks = [np.load(os.path.join(dir_path, "assign.npy"))]
        self._code_chunks = [np.load(os.path.join(dir_path, "codes.npy"))]
        with open(os.path.join(dir_path, "index_meta.pkl"), "rb") as f:
            self.index_id_to_db_id = pickle.load(f)
        self._packed = None

    def memory_bytes(self) -> int:
        """Index memory at rest: packed codes + id/home maps + centroids
        + codebooks (BASELINE.md equal-memory accounting). Bounded at
        ~nlist * p99-list-size even under pathological assignment skew
        (see _build)."""
        codes, ids_map, home_map, _ = self._build()
        return int(codes.size + ids_map.size * 4 + home_map.size * 4
                   + self.centroids.size * 4 + self.codebooks.size * 4)
