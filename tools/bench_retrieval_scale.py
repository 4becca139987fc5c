"""Retrieval parity table at scale (VERDICT r1 weak #6/#7): flat vs PQ
vs IVF-PQ on a >=1M x 768 synthetic corpus — QPS, index bytes, and
recall@10/100 vs exact search. The flat index IS exact, so its results
are the ground truth; the compressed engines report recall *at* their
memory budget (BASELINE.md's equal-memory axis).

Usage:
    python tools/bench_retrieval_scale.py                # 1M rows
    python tools/bench_retrieval_scale.py --n 200000     # smaller
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clustered_corpus(n: int, d: int, n_anchors: int = 4096,
                     seed: int = 0, chunk: int = 100_000) -> np.ndarray:
    """Anchor+noise corpus (realistic ANN difficulty: clustered, not
    uniform), generated in chunks to bound peak host memory."""
    rng = np.random.default_rng(seed)
    anchors = rng.normal(size=(n_anchors, d)).astype(np.float32)
    out = np.empty((n, d), np.float32)
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        idx = rng.integers(0, n_anchors, e - s)
        out[s:e] = anchors[idx] + 0.35 * rng.normal(
            size=(e - s, d)).astype(np.float32)
    return out


def recall(hits, truth, k: int) -> float:
    return float(np.mean([
        len(set(h[0][:k]) & set(t[0][:k])) / k for h, t in zip(hits, truth)]))


def timed_search(idx, queries, k: int):
    # warm at the measured shape: a smaller warm batch would leave the
    # full-batch jit compile inside the timed region
    res = idx.search_knn(queries, k)
    t0 = time.perf_counter()
    res = idx.search_knn(queries, k)
    dt = time.perf_counter() - t0
    return res, len(queries) / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--queries", type=int, default=256)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--m", type=int, default=96)
    p.add_argument("--nlist", type=int, default=1024)
    p.add_argument("--nprobe", type=int, default=64)
    p.add_argument("--train_rows", type=int, default=200_000)
    p.add_argument("--engines", default="flat,pq,ivfpq",
                   help="comma list; run engines selectively so a "
                        "crash in one does not cost the others' numbers")
    p.add_argument("--no-normalize", dest="normalize", action="store_false")
    # default normalized rows: retrieval embeddings are L2-normalized
    # (--norm_query/--norm_doc, BEIR cosine convention), and PQ behaves
    # differently on the unit sphere than on raw gaussians
    args = p.parse_args()
    engines = {e.strip() for e in args.engines.split(",") if e.strip()}
    unknown = engines - {"flat", "pq", "ivfpq"}
    if unknown:
        p.error(f"unknown engines {sorted(unknown)}; "
                "choose from flat, pq, ivfpq")

    from czechtriever_tpu.retrieval.flat import FlatIndex
    from czechtriever_tpu.retrieval.ivf import IVFPQIndex
    from czechtriever_tpu.retrieval.pq import PQIndex

    print(f"corpus {args.n}x{args.d} ...", file=sys.stderr)
    corpus = clustered_corpus(args.n, args.d)
    rng = np.random.default_rng(1)
    qidx = rng.integers(0, args.n, args.queries)
    queries = (corpus[qidx]
               + 0.05 * rng.normal(size=(args.queries, args.d))
               ).astype(np.float32)
    if args.normalize:
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    ids = [str(i) for i in range(args.n)]
    rows = []

    # exact ground truth (host, chunked): independent of whether the
    # flat engine is in this run's --engines
    t0 = time.perf_counter()
    gt_v = np.full((args.queries, args.k), -np.inf, np.float32)
    gt_i = np.zeros((args.queries, args.k), np.int64)
    for s in range(0, args.n, 200_000):
        e = min(args.n, s + 200_000)
        sc = queries @ corpus[s:e].T
        kth = min(args.k, e - s)            # last chunk can be < k wide
        top = np.argpartition(-sc, kth - 1, axis=1)[:, :kth]
        cat_v = np.concatenate([gt_v, np.take_along_axis(sc, top, 1)], 1)
        cat_i = np.concatenate([gt_i, top + s], 1)
        sel = np.argpartition(-cat_v, args.k - 1, axis=1)[:, :args.k]
        gt_v = np.take_along_axis(cat_v, sel, 1)
        gt_i = np.take_along_axis(cat_i, sel, 1)
    order = np.argsort(-gt_v, axis=1)
    gt_i = np.take_along_axis(gt_i, order, 1)
    truth = [([str(j) for j in row], None) for row in gt_i]
    print(f"exact ground truth on host: {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)

    if "flat" in engines:
        t0 = time.perf_counter()
        flat = FlatIndex(args.d)
        flat.index_data(ids, corpus)
        t_build = time.perf_counter() - t0
        hits, qps = timed_search(flat, queries, args.k)
        rows.append(dict(engine="flat", build_s=round(t_build, 1),
                         qps=round(qps, 1), mem_mb=round(
                             args.n * args.d * 4 / 1e6, 1),
                         recall10=round(recall(hits, truth, 10), 3),
                         recall100=round(recall(hits, truth, 100), 3)))
        print(rows[-1], file=sys.stderr)
        del flat

    if "pq" in engines:
        t0 = time.perf_counter()
        pq = PQIndex(args.d, args.m, 8, kmeans_iters=10)
        pq.train(corpus[:args.train_rows])
        pq.index_data(ids, corpus)
        t_build = time.perf_counter() - t0
        hits, qps = timed_search(pq, queries, args.k)
        rows.append(dict(engine=f"pq(m={args.m})",
                         build_s=round(t_build, 1),
                         qps=round(qps, 1),
                         mem_mb=round(pq.memory_bytes() / 1e6, 1),
                         recall10=round(recall(hits, truth, 10), 3),
                         recall100=round(recall(hits, truth, 100), 3)))
        print(rows[-1], file=sys.stderr)
        del pq

    if "ivfpq" in engines:
        t0 = time.perf_counter()
        ivf = IVFPQIndex(args.d, args.m, 8, nlist=args.nlist,
                         nprobe=args.nprobe, train_iters=10)
        ivf.train(corpus[:args.train_rows])
        ivf.index_data(ids, corpus)
        ivf._build()
        t_build = time.perf_counter() - t0
        hits, qps = timed_search(ivf, queries, args.k)
        rows.append(dict(
            engine=f"ivfpq(nlist={args.nlist},np={args.nprobe})",
            build_s=round(t_build, 1), qps=round(qps, 1),
            mem_mb=round(ivf.memory_bytes() / 1e6, 1),
            recall10=round(recall(hits, truth, 10), 3),
            recall100=round(recall(hits, truth, 100), 3)))
        print(rows[-1], file=sys.stderr)

    print(json.dumps({"n": args.n, "d": args.d, "k": args.k,
                      "queries": args.queries, "rows": rows}))


if __name__ == "__main__":
    main()
