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
  * **search** — **batch-union pruning**: coarse scores on the MXU pick
    top-``nprobe`` lists per query; the *union* of lists probed by any
    query in the batch is gathered into one contiguous code matrix and
    scored for ALL queries with the same lane-vectorized blocked ADC as
    the exhaustive PQ scan (LUT laid out [m, ksub, Q] so every fetched
    LUT row is reused across the whole query lane dim). Final score =
    q.centroid_home + q.residual (exact ADC inner product).

Why union pruning and not per-query probed gathers: a per-query gather
indexes the LUT with scalar (per-element) indices — measured ~40x
slower than the lane-vectorized exhaustive scan on a v5e (125M scalar
lookups/s vs ~77 GB/s of [Q]-wide LUT-row fetches). Scoring the union
for every query keeps the vector-friendly access pattern and prunes
the scan to the probed fraction of the corpus; each query may see
*extra* exactly-scored candidates from lists probed only by its
batch-mates. Measured (docs/PERF.md round-4 pooled sweep, 1M x 768,
m=96, nlist=1024, nprobe=8): 4.1x / 2.0x / 1.2x exhaustive PQ's QPS
at Q=1/8/32 with equal-or-better recall@10 and recall@100.

**Small-Q top-10 recall is NOT a weakness** (round-4 correction): the
round-3 sweep's "Q=1 recall@10 = half of exhaustive PQ" row was
computed over a single query — a 10-item sample. Re-measured over a
64-query pool searched in Q-sized batches (docs/PERF.md round-4
sweep), np=8 IVF-PQ scores recall@10 = 0.200 vs exhaustive PQ's 0.191
and recall@100 = 0.520 vs 0.516 at EVERY Q in {1, 8, 32}; recall is
flat in nprobe because the (m, n_bits) quantization ceiling dominates.
``adaptive_nprobe`` (default OFF) remains available for genuinely
starved configs — it raises the per-query probe count until the batch
union targets ``target_probe_lists`` (default nlist//8) lists, which
measurably helps only when nprobe covers a far smaller list fraction
than that target (tests/test_ivf.py exercises nprobe=2 of nlist=64).

Engine choice guidance (measured, docs/PERF.md): use FlatIndex while
the corpus fits HBM — it is exact AND faster than both PQ engines at
1M rows; switch to PQ/IVF-PQ only beyond the flat HBM boundary
(~4-5M rows f32, ~8M bf16 per 16 GB chip; 96 B/row PQ reaches ~150M),
preferring IVF-PQ at small serving batches. Raising nprobe past ~8 is
NOT the recall lever at m=96 — recall@100 is flat in nprobe while QPS
falls; the quantization ceiling (m, n_bits) dominates. The recall
lever is the exact re-rank stage (retrieval/refine.py, round-5): at
1M x 768 refine(IVF-PQ np=8, R=1000) measures recall@10 0.977 at
2.46x exhaustive-PQ QPS — the host-side rescore rides under the
device ADC scan, paying with host RAM for the original store.
Both compressed engines also shard over the mesh ``data`` axis
(mesh=...): PQ row-shards the code matrix, IVF-PQ list-shards the
packed tensors (sharded_union_adc_search), so corpus capacity and
scan work scale with device count like the flat engine.

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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from czechtriever_tpu.ops import kmeans as kmeans_ops
from czechtriever_tpu.parallel.mesh import DATA_AXIS
from czechtriever_tpu.retrieval import pq as pq_mod

NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnames=("nprobe",))
def coarse_probe(queries: jnp.ndarray, centroids: jnp.ndarray,
                 nprobe: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-``nprobe`` inverted lists per query by the L2-compatible
    coarse score q.c - ||c||^2/2. Returns (probe_i [Q, nprobe] int32,
    ip_t [nlist, Q] f32) — ip_t is reused by union_adc_search as the
    home-centroid base score, saving a second q.cT matmul."""
    q32 = queries.astype(jnp.float32)
    c32 = centroids.astype(jnp.float32)
    ip_t = jnp.dot(c32, q32.T, preferred_element_type=jnp.float32)
    sel = ip_t.T - 0.5 * jnp.sum(c32 * c32, axis=1)[None, :]
    _, probe_i = jax.lax.top_k(sel, nprobe)
    return probe_i.astype(jnp.int32), ip_t


def _union_core(queries: jnp.ndarray, ip_t: jnp.ndarray,
                codes: jnp.ndarray, ids_map: jnp.ndarray,
                home_map: jnp.ndarray, list_sizes: jnp.ndarray,
                codebooks: jnp.ndarray, union_lists: jnp.ndarray,
                n_union: jnp.ndarray, k: int, block: int = 8192
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score the union of probed lists for every query with the
    lane-vectorized blocked ADC (see module docstring).

    queries [Q, D]; ip_t [nlist, Q] f32 (home-centroid base scores
    from coarse_probe, laid out so the per-block fetch below is a
    [Q]-wide row gather like the LUT's); codes [nlist, C, m] uint8;
    ids_map/home_map [nlist, C] int32; list_sizes [nlist] int32;
    codebooks [m, ksub, dsub]; union_lists [U_pad] int32
    (bucket-padded, padding masked by ``n_union``). Returns
    (scores [Q, k'], row ids [Q, k']) with k' = min(k, U_pad*C);
    entries beyond the real candidate count carry -inf scores — the
    caller drops them."""
    Q, D = queries.shape
    nlist, C, m = codes.shape
    ksub = codebooks.shape[1]
    dsub = D // m
    U = union_lists.shape[0]
    k = min(k, U * C)

    q32 = queries.astype(jnp.float32)

    # residual ADC LUT, [m, ksub, Q] (lane dim = queries)
    qsub = q32.reshape(Q, m, dsub)
    lut = jnp.einsum("qmd,mcd->mcq", qsub, codebooks.astype(jnp.float32))
    sub_ids = jnp.arange(m, dtype=jnp.int32)

    # one contiguous block-gather of the probed lists
    g_codes = codes[union_lists].reshape(U * C, m)       # [R, m]
    g_home = home_map[union_lists].reshape(U * C)        # [R]
    g_ids = ids_map[union_lists].reshape(U * C)          # [R]
    slot = jax.lax.broadcasted_iota(jnp.int32, (U, C), 1)
    in_list = slot < list_sizes[union_lists][:, None]
    real = (jax.lax.broadcasted_iota(jnp.int32, (U, C), 0)
            < n_union.astype(jnp.int32))
    g_valid = (in_list & real).reshape(U * C)

    R = U * C
    pad = (-R) % block
    g_codes = jnp.pad(g_codes, ((0, pad), (0, 0)))
    g_home = jnp.pad(g_home, (0, pad))
    g_ids = jnp.pad(g_ids, (0, pad))
    g_valid = jnp.pad(g_valid, (0, pad))
    nb = (R + pad) // block

    def body(carry, xs):
        run_v, run_i = carry
        blk, home_blk, ids_blk, ok_blk = xs
        # gathered[m, n, q] = lut[m, blk[n, m], q] — [Q]-row fetches
        gathered = lut[sub_ids[:, None], blk.T.astype(jnp.int32), :]
        res = gathered.sum(axis=0)                  # [block, Q]
        base = ip_t[home_blk, :]                    # [block, Q]
        total = jnp.where(ok_blk[:, None], base + res, NEG_INF).T
        cat_v = jnp.concatenate([run_v, total], axis=1)
        cat_i = jnp.concatenate(
            [run_i, jnp.broadcast_to(ids_blk[None, :], (Q, block))], axis=1)
        v, sel = jax.lax.top_k(cat_v, k)
        return (v, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (jnp.full((Q, k), NEG_INF), jnp.zeros((Q, k), jnp.int32))
    (v, i), _ = jax.lax.scan(
        body, init,
        (g_codes.reshape(nb, block, m),
         g_home.reshape(nb, block),
         g_ids.reshape(nb, block),
         g_valid.reshape(nb, block)))
    return v, i


union_adc_search = jax.jit(_union_core, static_argnames=("k", "block"))


@functools.partial(jax.jit, static_argnames=("k", "block", "mesh"))
def sharded_union_adc_search(queries, ip_t, codes, ids_map, home_map,
                             list_sizes, codebooks, local_unions,
                             local_counts, k: int, mesh: Mesh,
                             block: int = 8192
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Union ADC over inverted lists LIST-sharded on the mesh ``data``
    axis. The host splits the batch union by shard ownership
    (IVFPQIndex._split_union), so each device gathers and scores only
    the probed lists it owns — compute AND list storage scale with
    device count (the flat engine's structure, adapted to list
    sharding). ip_t / codebooks stay replicated: home_map entries are
    GLOBAL list ids, so the base-score lookup needs the full [nlist, Q]
    table (nlist*Q f32 is small next to the code tensor). Local top-k
    candidates all-gather over ICI and merge with one final top-k.

    codes [ws*L, C, m] (+ids/home [ws*L, C], sizes [ws*L]) sharded on
    axis 0; local_unions [ws, U_loc] int32 LOCAL list indices per shard
    (padding masked by local_counts [ws])."""
    ws = mesh.shape[DATA_AXIS]
    C = codes.shape[1]
    U_loc = local_unions.shape[1]
    k_loc = min(k, U_loc * C)

    def local(q, ipt, c, im, hm, sz, cb, ul, nu):
        v, i = _union_core(q, ipt, c, im, hm, sz, cb, ul[0], nu[0],
                           k_loc, block)
        vg = jax.lax.all_gather(v, DATA_AXIS)   # [ws, Q, k_loc]
        ig = jax.lax.all_gather(i, DATA_AXIS)
        Q = q.shape[0]
        vg = jnp.swapaxes(vg, 0, 1).reshape(Q, ws * k_loc)
        ig = jnp.swapaxes(ig, 0, 1).reshape(Q, ws * k_loc)
        fv, sel = jax.lax.top_k(vg, min(k, ws * k_loc))
        return fv, jnp.take_along_axis(ig, sel, axis=1)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS, None, None),
                  P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS),
                  P(), P(DATA_AXIS, None), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, ip_t, codes, ids_map, home_map, list_sizes, codebooks,
      local_unions, local_counts)


class IVFPQIndex:
    """Inverted-file PQ index with the same external contract as
    FlatIndex/PQIndex (index_data / search_knn / serialize)."""

    def __init__(self, vector_sz: int, n_subquantizers: int,
                 n_bits: int = 8, nlist: int = 256, nprobe: int = 8,
                 train_iters: int = 20, seed: int = 0,
                 query_batch: int = 1024, adaptive_nprobe: bool = False,
                 target_probe_lists: Optional[int] = None,
                 mesh: Optional[Mesh] = None):
        assert vector_sz % n_subquantizers == 0
        self.mesh = mesh
        self._nlist_pad = None  # set by _build (nlist padded to the mesh)
        self.vector_sz = vector_sz
        self.m = n_subquantizers
        self.n_bits = n_bits
        self.ksub = 2 ** n_bits
        self.nlist = nlist
        self.nprobe = nprobe
        self.train_iters = train_iters
        self.seed = seed
        self.query_batch = query_batch
        # adaptive nprobe (default OFF): raises the per-query probe
        # count at small Q until the batch union targets
        # ``target_probe_lists`` lists (default nlist//8). Round-3's
        # "Q=1 recall@10 is half of exhaustive PQ" motivation turned
        # out to be a single-query sampling artifact: the round-4
        # 64-query-pool sweep (docs/PERF.md) measures np=8 IVF-PQ at
        # recall@10 0.200 vs PQ 0.191 at EVERY Q, recall flat in
        # nprobe (the (m, n_bits) ceiling dominates), while adaptive
        # costs up to 2.3x QPS at Q=1. Keep it for genuinely starved
        # configs (nprobe covering <~1% of lists on unclustered data).
        self.adaptive_nprobe = adaptive_nprobe
        self.target_probe_lists = target_probe_lists
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
        spill_groups: List[Tuple[int, np.ndarray]] = []
        for li in range(self.nlist):
            n = int(sizes[li])
            rows = order[start:start + n]
            keep = int(capped[li])
            packed_codes[li, :keep] = codes[rows[:keep]]
            ids_map[li, :keep] = rows[:keep]
            home_map[li, :keep] = li
            fill[li] = keep
            if n > keep:
                spill_groups.append((li, rows[keep:]))
            start += n

        if spill_groups:
            # neighbor order by centroid-centroid L2 (a proxy for "lists
            # a query probing the home list would also probe")
            c = self.centroids
            d2 = (np.sum(c * c, axis=1)[:, None]
                  - 2.0 * (c @ c.T) + np.sum(c * c, axis=1)[None, :])
            neighbor_order = np.argsort(d2, axis=1)
            # spilled rows share their home's neighbor walk, so place a
            # whole home-group at once, each candidate taking as many
            # rows as it has space for — same placement as a per-row
            # walk (rows fill nearest non-full candidates in order) but
            # O(nlist * walk) python steps instead of O(rows * walk)
            for home, rows_group in spill_groups:
                pos = 0
                for cand in neighbor_order[home]:
                    if pos >= len(rows_group):
                        break
                    space = C - int(fill[cand])
                    if space <= 0:
                        continue
                    take = min(space, len(rows_group) - pos)
                    sel = rows_group[pos:pos + take]
                    sl = slice(int(fill[cand]), int(fill[cand]) + take)
                    packed_codes[cand, sl] = codes[sel]
                    ids_map[cand, sl] = sel
                    home_map[cand, sl] = home
                    fill[cand] += take
                    pos += take
                if pos < len(rows_group):  # pragma: no cover — impossible:
                    raise RuntimeError("no spill capacity left")  # nlist*C>=N

        if self.mesh is not None:
            # LIST-shard the packed tensors over the data axis: each
            # device stores and scans only the lists it owns (see
            # sharded_union_adc_search). nlist pads up to the shard
            # count with empty lists (size 0 -> fully masked).
            ws = self.mesh.shape[DATA_AXIS]
            pad_l = (-self.nlist) % ws
            if pad_l:
                packed_codes = np.concatenate(
                    [packed_codes,
                     np.zeros((pad_l, C, self.m), np.uint8)])
                ids_map = np.concatenate(
                    [ids_map, np.zeros((pad_l, C), np.int32)])
                home_map = np.concatenate(
                    [home_map, np.zeros((pad_l, C), np.int32)])
                fill = np.concatenate([fill, np.zeros(pad_l, np.int64)])
            self._nlist_pad = self.nlist + pad_l
            sh1 = NamedSharding(self.mesh, P(DATA_AXIS))
            sh2 = NamedSharding(self.mesh, P(DATA_AXIS, None))
            sh3 = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
            self._packed = (jax.device_put(packed_codes, sh3),
                            jax.device_put(ids_map, sh2),
                            jax.device_put(home_map, sh2),
                            jax.device_put(fill.astype(np.int32), sh1))
        else:
            self._nlist_pad = self.nlist
            self._packed = (jnp.asarray(packed_codes),
                            jnp.asarray(ids_map), jnp.asarray(home_map),
                            jnp.asarray(fill.astype(np.int32)))
        return self._packed

    def _split_union(self, union: np.ndarray):
        """Split the batch's global union by shard ownership -> LOCAL
        list indices [ws, U_loc] (power-of-two padded to keep the jit
        shape count small) + per-shard counts [ws]."""
        ws = self.mesh.shape[DATA_AXIS]
        L0 = self._nlist_pad // ws
        shards = [union[(union >= s * L0) & (union < (s + 1) * L0)] - s * L0
                  for s in range(ws)]
        u_max = max(len(sh) for sh in shards)
        u_pad = 1
        while u_pad < max(u_max, 1):
            u_pad *= 2
        u_pad = min(u_pad, L0)
        ul = np.zeros((ws, u_pad), np.int32)
        cnt = np.zeros(ws, np.int32)
        for si, loc in enumerate(shards):
            ul[si, :len(loc)] = loc
            cnt[si] = len(loc)
        return ul, cnt

    def _effective_nprobe(self, n_real: int) -> int:
        """Per-query probe count for a batch of ``n_real`` queries: at
        least ``nprobe``; with adaptive_nprobe, enough that the batch
        union can reach ``target_probe_lists`` (default nlist//8)."""
        np_eff = min(self.nprobe, self.nlist)
        if self.adaptive_nprobe and n_real > 0:
            target = self.target_probe_lists or max(self.nprobe,
                                                    self.nlist // 8)
            np_eff = max(np_eff, min(self.nlist,
                                     -(-int(target) // n_real)))
        return np_eff

    # -- search ----------------------------------------------------------------
    def search_rows(self, query_vectors: np.ndarray, k: int,
                    index_batch_size: Optional[int] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Raw top-k: (scores [Q, k'], internal row ids [Q, k']) with
        k' <= k; -inf scores mark slots beyond the probed candidate
        count (the refine stage and search_knn both drop them)."""
        codes, ids_map, home_map, sizes = self._build()
        bs = index_batch_size or self.query_batch
        queries = np.asarray(query_vectors, np.float32)
        nq = len(queries)
        k = min(k, self.ntotal)
        vs, is_ = [], []
        cents = jnp.asarray(self.centroids)
        cbs_dev = jnp.asarray(self.codebooks)
        for s in range(0, nq, bs):
            q = queries[s:s + bs]
            n_real = len(q)
            if n_real < bs and nq > bs:
                q = np.concatenate(
                    [q, np.zeros((bs - n_real, q.shape[1]), np.float32)])
            qd = jnp.asarray(q)
            probe_dev, ip_t = coarse_probe(
                qd, cents, self._effective_nprobe(n_real))
            probe_i = np.asarray(probe_dev)
            # union over the REAL queries only (pad rows probe garbage)
            union = np.unique(probe_i[:n_real].ravel())
            # bucket-pad to the next power of two (few jit shapes)
            u_pad = 1
            while u_pad < len(union):
                u_pad *= 2
            u_pad = min(u_pad, self.nlist)
            if self.mesh is not None:
                lul, cnt = self._split_union(union)
                v, i = sharded_union_adc_search(
                    qd, ip_t, codes, ids_map, home_map, sizes, cbs_dev,
                    jnp.asarray(lul), jnp.asarray(cnt), k, self.mesh)
            else:
                ul = np.zeros(u_pad, np.int32)
                ul[:len(union)] = union
                v, i = union_adc_search(
                    qd, ip_t, codes, ids_map, home_map, sizes, cbs_dev,
                    jnp.asarray(ul), jnp.asarray(len(union), jnp.int32),
                    k)
            vs.append(np.asarray(v)[:n_real])
            is_.append(np.asarray(i)[:n_real])
        # per-call k' can differ across query batches (k' = min(k,
        # probed capacity)); right-pad with -inf to the widest
        kw = max(a.shape[1] for a in vs)
        vs = [np.pad(a, ((0, 0), (0, kw - a.shape[1])),
                     constant_values=NEG_INF) for a in vs]
        is_ = [np.pad(a, ((0, 0), (0, kw - a.shape[1]))) for a in is_]
        return np.concatenate(vs), np.concatenate(is_)

    def search_knn(self, query_vectors: np.ndarray, top_docs: int,
                   index_batch_size: Optional[int] = None
                   ) -> List[Tuple[List[str], List[float]]]:
        v, i = self.search_rows(query_vectors, top_docs, index_batch_size)
        id_arr = np.asarray([str(x) for x in self.index_id_to_db_id],
                            dtype=object)
        out: List[Tuple[List[str], List[float]]] = []
        for row_ids, row_v in zip(id_arr[i], v):
            # drop top-k padding (probed union held < k real
            # candidates): real inner products are finite, so -inf
            # marks exactly the carry-init slots (FAISS pads these
            # with id -1; we truncate instead)
            n_ok = int(np.sum(np.isfinite(row_v)))
            out.append((list(row_ids[:n_ok]), row_v[:n_ok].tolist()))
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
                       "nlist": self.nlist, "nprobe": self.nprobe,
                       "adaptive_nprobe": self.adaptive_nprobe,
                       "target_probe_lists": self.target_probe_lists}, f)

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
