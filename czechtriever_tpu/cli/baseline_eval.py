"""BM25 lexical baseline evaluation on a BEIR dataset
(reference baseline_evaluation.py).

The reference requires a running Elasticsearch service; this runs the
native in-memory Okapi BM25 (evaluation/bm25.py) with ES-default
parameters and reports the same NDCG/MAP/Recall/P (+MRR) metrics.

  python -m czechtriever_tpu.cli.baseline_eval \\
      --dataset fit-eval --beir_dir BEIR/datasets
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

from czechtriever_tpu.evaluation import metrics as M
from czechtriever_tpu.evaluation.beir import load_beir_dataset
from czechtriever_tpu.evaluation.bm25 import BM25Index

logger = logging.getLogger(__name__)


def evaluate_bm25(data_folder: str, split: str = "test",
                  k_values=M.DEFAULT_K_VALUES, k1: float = 1.2,
                  b: float = 0.75) -> dict:
    corpus, queries, qrels = load_beir_dataset(data_folder, split)
    index = BM25Index(k1=k1, b=b)
    index.index_corpus(corpus)
    results = index.retrieve(queries, top_k=max(k_values))
    out = {}
    ndcg, _map, rec, prec = M.evaluate(qrels, results, k_values)
    for metric in (ndcg, _map, rec, prec,
                   M.evaluate_custom(qrels, results, k_values, "mrr")):
        for key, value in metric.items():
            out[key] = 100 * value
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, nargs="+", required=True)
    p.add_argument("--beir_dir", type=str, default="BEIR/datasets")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--k1", type=float, default=1.2)
    p.add_argument("--b", type=float, default=0.75)
    p.add_argument("--output", type=str, default=None)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    all_metrics = {}
    for ds in args.dataset:
        res = evaluate_bm25(os.path.join(args.beir_dir, ds), args.split,
                            k1=args.k1, b=args.b)
        for k, v in sorted(res.items()):
            logger.info("%s %s: %.2f", ds, k, v)
        all_metrics[ds] = res
    if args.output:
        with open(args.output, "w") as f:
            json.dump(all_metrics, f, indent=2, sort_keys=True)


if __name__ == "__main__":
    main(sys.argv[1:])
