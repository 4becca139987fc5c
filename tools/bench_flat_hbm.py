"""Flat exact search at the HBM boundary (VERDICT r2 next #8).

PERF.md claims flat covers "~4-5M rows at f32, 2x at bf16" on one v5e
(16 GB HBM) — this measures it: build the largest bf16 corpus that fits
(default 8M x 768 = 12.3 GB), search on-device, and report QPS plus
recall of the bf16 engine against f32-exact host ground truth, so the
"2x at bf16" claim carries a measured accuracy cost instead of an
assumption. The reference never faces this boundary: FAISS lives in
host RAM (/root/reference/src/index.py:19-21); on TPU the corpus lives
in HBM and dtype is the capacity lever.

Usage:
    python tools/bench_flat_hbm.py                   # 8M x 768 bf16
    python tools/bench_flat_hbm.py --n 4000000 --dtype float32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_retrieval_scale import recall  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--queries", type=int, default=256)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from czechtriever_tpu.retrieval.flat import FlatIndex

    # clustered corpus, generated chunk-wise into one f32 buffer so the
    # anchors give queries realistic near-duplicate structure at 8M rows
    rng = np.random.default_rng(0)
    n_anchors = 4096
    anchors = rng.normal(size=(n_anchors, args.d)).astype(np.float32)
    corpus = np.empty((args.n, args.d), np.float32)
    t0 = time.perf_counter()
    for s in range(0, args.n, 500_000):
        e = min(args.n, s + 500_000)
        a = rng.integers(0, n_anchors, e - s)
        corpus[s:e] = anchors[a] + 0.3 * rng.normal(
            size=(e - s, args.d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    print(f"corpus {args.n}x{args.d}: {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)

    qidx = rng.integers(0, args.n, args.queries)
    queries = (corpus[qidx]
               + 0.05 * rng.normal(size=(args.queries, args.d))
               ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    ids = [str(i) for i in range(args.n)]

    # f32-exact ground truth on host (chunked running top-k)
    t0 = time.perf_counter()
    gt_v = np.full((args.queries, args.k), -np.inf, np.float32)
    gt_i = np.zeros((args.queries, args.k), np.int64)
    for s in range(0, args.n, 200_000):
        e = min(args.n, s + 200_000)
        sc = queries @ corpus[s:e].T
        top = np.argpartition(-sc, args.k - 1, axis=1)[:, :args.k]
        cat_v = np.concatenate([gt_v, np.take_along_axis(sc, top, 1)], 1)
        cat_i = np.concatenate([gt_i, top + s], 1)
        sel = np.argpartition(-cat_v, args.k - 1, axis=1)[:, :args.k]
        gt_v = np.take_along_axis(cat_v, sel, 1)
        gt_i = np.take_along_axis(cat_i, sel, 1)
    order = np.argsort(-gt_v, axis=1)
    gt_i = np.take_along_axis(gt_i, order, 1)
    truth = [([str(j) for j in row], None) for row in gt_i]
    print(f"f32-exact ground truth: {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)

    idx = FlatIndex(args.d, dtype=args.dtype)
    idx.index_data(ids, corpus)
    t0 = time.perf_counter()
    idx._build()
    build_s = time.perf_counter() - t0
    del corpus  # free 24.6 GB of host staging before timing

    hits = idx.search_knn(queries, args.k)       # warm/compile
    t0 = time.perf_counter()
    for _ in range(args.reps):
        hits = idx.search_knn(queries, args.k)
    dt = (time.perf_counter() - t0) / args.reps
    out = {
        "engine": f"flat-{args.dtype}", "n": args.n, "d": args.d,
        "queries": args.queries, "k": args.k,
        "hbm_gb": round(args.n * args.d
                        * (2 if args.dtype == "bfloat16" else 4) / 2**30, 2),
        "build_s": round(build_s, 1),
        "qps": round(args.queries / dt, 1),
        "ms_per_batch": round(dt * 1e3, 1),
        "recall10_vs_f32_exact": round(recall(hits, truth, 10), 4),
        "recall100_vs_f32_exact": round(recall(hits, truth, 100), 4),
    }
    print(out, file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
