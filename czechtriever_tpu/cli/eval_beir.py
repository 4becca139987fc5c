"""Standalone BEIR evaluation of a checkpoint (reference eval_beir.py).

Evaluates a local model dir (or training checkpoint) on one or more
BEIR-format datasets and prints/saves the metric dict. Mirrors the
reference's dataset/split convention: msmarco evaluates the dev split,
everything else test (eval_beir.py:51).

Usage:
  python -m czechtriever_tpu.cli.eval_beir \\
      --model_name_or_path models/czert --dataset fit-eval \\
      --beir_dir BEIR/datasets
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

from czechtriever_tpu.cli import common
from czechtriever_tpu.config import Config
from czechtriever_tpu.evaluation import beir as beir_eval
from czechtriever_tpu.utils.logging_utils import init_logger

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, nargs="+", required=True)
    p.add_argument("--beir_dir", type=str, default="BEIR/datasets")
    p.add_argument("--split", type=str, default=None,
                   help="default: dev for msmarco, else test")
    p.add_argument("--model_name_or_path", type=str, required=True)
    p.add_argument("--per_gpu_batch_size", type=int, default=128)
    p.add_argument("--output_dir", type=str, default="./beir_eval")
    p.add_argument("--norm_query", action="store_true")
    p.add_argument("--norm_doc", action="store_true")
    p.add_argument("--lower_case", action="store_true")
    p.add_argument("--normalize_text", action="store_true")
    p.add_argument("--pooling", type=str, default="average")
    p.add_argument("--score_function", type=str, default="dot",
                   choices=("dot", "cos_sim"),
                   help="similarity between embeddings (reference "
                        "eval_beir.py:75)")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--save_results_path", type=str, default=None)
    p.add_argument("--pack_rows", type=int, default=256,
                   help="length-packed corpus encode row budget "
                        "(evaluation/beir.py DenseEncoder; 0 = "
                        "unpacked bucketed path)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    init_logger(args.output_dir)
    cfg = Config(retriever_model_id=args.model_name_or_path,
                 dtype=args.dtype, dropout=0.0, pooling=args.pooling)
    params, mcfg, tokenizer = common.resolve_model(cfg)
    params = common.init_or_load_params(cfg, mcfg, params)
    if tokenizer is None:
        raise SystemExit("model dir must provide a vocab.txt tokenizer")

    all_metrics = {}
    for dataset in args.dataset:
        split = args.split or ("dev" if dataset == "msmarco" else "test")
        res = beir_eval.evaluate_model(
            params, mcfg, tokenizer, dataset, beir_dir=args.beir_dir,
            split=split, batch_size=args.per_gpu_batch_size,
            norm_query=args.norm_query, norm_doc=args.norm_doc,
            lower_case=args.lower_case, normalize_text=args.normalize_text,
            pooling=args.pooling, score_function=args.score_function,
            save_results_path=args.save_results_path,
            pack_rows=args.pack_rows)
        for k, v in sorted(res.items()):
            logger.info("%s %s: %.2f", dataset, k, v)
        all_metrics[dataset] = res
    out = os.path.join(args.output_dir, "beir_metrics.json")
    with open(out, "w") as f:
        json.dump(all_metrics, f, indent=2, sort_keys=True)
    logger.info("Saved metrics to %s", out)


if __name__ == "__main__":
    main(sys.argv[1:])
