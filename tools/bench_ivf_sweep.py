"""IVF-PQ operating-point sweep (VERDICT r2 next #2): where, if
anywhere, does IVF-PQ beat exhaustive PQ?

Sweeps batch size Q x nprobe on one corpus/ground-truth build and
prints QPS + recall@10/100 for flat / PQ / IVF-PQ at each Q, so the
crossover (or its absence) is a measured table instead of the
``retrieval/ivf.py`` docstring's assertion. The reference's axis is
equal index memory (/root/reference/src/index.py:19-21); PQ and IVF-PQ
here share m/n_bits so their code memory is identical — IVF adds only
the centroids + list structure.

Usage:
    python tools/bench_ivf_sweep.py                 # 1M x 768
    python tools/bench_ivf_sweep.py --n 200000 --qs 1,8 --nprobes 8,16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_retrieval_scale import clustered_corpus, recall  # noqa: E402


def timed(idx, queries, k, reps):
    res = idx.search_knn(queries, k)        # warm/compile at this shape
    t0 = time.perf_counter()
    for _ in range(reps):
        res = idx.search_knn(queries, k)
    dt = (time.perf_counter() - t0) / reps
    return res, len(queries) / dt, dt * 1e3


def recall_at_Q(idx, queries, truth, Q, k):
    """Recall over the WHOLE query pool, searched in batches of size Q.

    Timing uses one Q-batch; recall must not — at Q=1 a single query's
    top-10 gives a 10-item sample (granularity 0.1), which is how the
    round-3 sweep published a statistically meaningless 'half recall'
    row. Batching by Q keeps the union-width effect faithful (IVF-PQ's
    per-batch probe union makes recall genuinely Q-dependent)."""
    hits = []
    for s in range(0, len(queries), Q):
        hits.extend(idx.search_knn(queries[s:s + Q], k))
    return (round(recall(hits, truth, 10), 3),
            round(recall(hits, truth, 100), 3))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--m", type=int, default=96)
    p.add_argument("--nlist", type=int, default=1024)
    p.add_argument("--train_rows", type=int, default=200_000)
    p.add_argument("--qs", default="1,8,32")
    p.add_argument("--nprobes", default="8,16,32,64")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--recall_pool", type=int, default=64,
                   help="query-pool size recall is averaged over "
                        "(searched in Q-sized batches)")
    args = p.parse_args()
    qs = [int(x) for x in args.qs.split(",")]
    nprobes = [int(x) for x in args.nprobes.split(",")]

    from czechtriever_tpu.retrieval.flat import FlatIndex
    from czechtriever_tpu.retrieval.ivf import IVFPQIndex
    from czechtriever_tpu.retrieval.pq import PQIndex

    print(f"corpus {args.n}x{args.d} ...", file=sys.stderr)
    corpus = clustered_corpus(args.n, args.d)
    rng = np.random.default_rng(1)
    qmax = max(max(qs), args.recall_pool)
    qidx = rng.integers(0, args.n, qmax)
    queries = (corpus[qidx]
               + 0.05 * rng.normal(size=(qmax, args.d))).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    ids = [str(i) for i in range(args.n)]

    # exact ground truth for the full query set (host, chunked)
    t0 = time.perf_counter()
    gt_v = np.full((qmax, args.k), -np.inf, np.float32)
    gt_i = np.zeros((qmax, args.k), np.int64)
    for s in range(0, args.n, 200_000):
        e = min(args.n, s + 200_000)
        sc = queries @ corpus[s:e].T
        kth = min(args.k, e - s)
        top = np.argpartition(-sc, kth - 1, axis=1)[:, :kth]
        cat_v = np.concatenate([gt_v, np.take_along_axis(sc, top, 1)], 1)
        cat_i = np.concatenate([gt_i, top + s], 1)
        sel = np.argpartition(-cat_v, args.k - 1, axis=1)[:, :args.k]
        gt_v = np.take_along_axis(cat_v, sel, 1)
        gt_i = np.take_along_axis(cat_i, sel, 1)
    order = np.argsort(-gt_v, axis=1)
    gt_i = np.take_along_axis(gt_i, order, 1)
    truth_all = [([str(j) for j in row], None) for row in gt_i]
    print(f"ground truth: {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    def stage(msg, t0):
        print(f"{msg}: {time.perf_counter() - t0:.0f}s", file=sys.stderr)
        return time.perf_counter()

    t = time.perf_counter()
    flat = FlatIndex(args.d)
    flat.index_data(ids, corpus)
    t = stage("flat build", t)
    pq = PQIndex(args.d, args.m, 8, kmeans_iters=10)
    pq.train(corpus[:args.train_rows])
    t = stage("pq train", t)
    pq.index_data(ids, corpus)
    t = stage("pq encode", t)
    ivf = IVFPQIndex(args.d, args.m, 8, nlist=args.nlist,
                     nprobe=nprobes[0], train_iters=10)
    ivf.train(corpus[:args.train_rows])
    t = stage("ivf train", t)
    ivf.index_data(ids, corpus)
    t = stage("ivf encode", t)
    ivf._build()
    t = stage("ivf pack", t)

    pool = queries[:args.recall_pool]
    truth_pool = truth_all[:args.recall_pool]
    rows = []
    for Q in qs:
        qb = queries[:Q]
        for name, idx in (("flat", flat), ("pq", pq)):
            _, qps, ms = timed(idx, qb, args.k, args.reps)
            r10, r100 = recall_at_Q(idx, pool, truth_pool, Q, args.k)
            rows.append(dict(engine=name, Q=Q, qps=round(qps, 1),
                             ms=round(ms, 2), recall10=r10,
                             recall100=r100))
            print(rows[-1], file=sys.stderr)
        for nprobe in nprobes:
            ivf.nprobe = nprobe
            ivf.adaptive_nprobe = False
            _, qps, ms = timed(ivf, qb, args.k, args.reps)
            r10, r100 = recall_at_Q(ivf, pool, truth_pool, Q, args.k)
            rows.append(dict(engine=f"ivfpq(np={nprobe})", Q=Q,
                             qps=round(qps, 1), ms=round(ms, 2),
                             recall10=r10, recall100=r100))
            print(rows[-1], file=sys.stderr)
        # adaptive nprobe (opt-in; measured here for comparison): union
        # targets nlist//8 lists, so small-Q batches spend the pruning
        # headroom on top-10 recall instead of scanning <1% of lists
        ivf.nprobe = nprobes[0]
        ivf.adaptive_nprobe = True
        np_eff = ivf._effective_nprobe(Q)
        _, qps, ms = timed(ivf, qb, args.k, args.reps)
        r10, r100 = recall_at_Q(ivf, pool, truth_pool, Q, args.k)
        rows.append(dict(engine=f"ivfpq(adaptive->np={np_eff})", Q=Q,
                         qps=round(qps, 1), ms=round(ms, 2),
                         recall10=r10, recall100=r100))
        print(rows[-1], file=sys.stderr)
        ivf.adaptive_nprobe = False
        ivf.nprobe = nprobes[0]

        # exact re-rank stage (retrieval/refine.py, round-5 stretch):
        # k=10, R = rf*10 ADC candidates re-scored against bf16
        # originals on the host. Compare at k=10 against plain PQ at
        # k=10 (the honest QPS denominator); the memory row includes
        # the original store per BASELINE.md equal-memory discipline.
        from czechtriever_tpu.retrieval.refine import RefinedIndex
        _, qps10, _ = timed(pq, qb, 10, args.reps)
        r10b, _ = recall_at_Q(pq, pool, truth_pool, Q, 10)
        rows.append(dict(engine="pq(k=10)", Q=Q, qps=round(qps10, 1),
                         recall10=r10b))
        print(rows[-1], file=sys.stderr)
        for rf in (10, 100):
            for bname, base in (("pq", pq), (f"ivfpq(np={nprobes[0]})",
                                             ivf)):
                ref = RefinedIndex(base, refine_factor=rf)
                ref.set_originals(corpus)
                _, qps, ms = timed(ref, qb, 10, args.reps)
                r10, _ = recall_at_Q(ref, pool, truth_pool, Q, 10)
                rows.append(dict(
                    engine=f"refine({bname}, R={rf * 10})", Q=Q,
                    qps=round(qps, 1), ms=round(ms, 2), recall10=r10,
                    mem_mb=round(ref.memory_bytes() / 1e6, 1)))
                print(rows[-1], file=sys.stderr)

    print(json.dumps({"n": args.n, "d": args.d, "k": args.k,
                      "m": args.m, "nlist": args.nlist, "rows": rows}))


if __name__ == "__main__":
    main()
