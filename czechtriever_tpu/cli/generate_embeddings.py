"""Corpus-shard passage embedding generator
(reference generate_passage_embeddings.py).

Slices the passage corpus into ``num_shards`` contiguous shards
(generate_passage_embeddings.py:80-86), encodes shard ``shard_id`` in
fixed-size batches on the TPU, and pickles ``(ids, embeddings)`` to
``<output_dir>/<prefix>_<shard_id:02d>`` — the exact artifact format the
retrieval stage consumes (passage_retrieval.py:66-71).

Usage:
  python -m czechtriever_tpu.cli.generate_embeddings \\
      --model_name_or_path models/czert --passages passages.tsv \\
      --shard_id 0 --num_shards 4 --output_dir embeddings
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle
import sys

import numpy as np

from czechtriever_tpu.cli import common
from czechtriever_tpu.config import Config
from czechtriever_tpu.data.normalize_text import normalize as normalize_fn
from czechtriever_tpu.data.passages import load_passages
from czechtriever_tpu.evaluation.beir import DenseEncoder
from czechtriever_tpu.utils.logging_utils import init_logger

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--passages", type=str, required=True,
                   help="jsonl or DPR tsv corpus")
    p.add_argument("--output_dir", type=str, default="wikipedia_embeddings")
    p.add_argument("--prefix", type=str, default="passages")
    p.add_argument("--shard_id", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--per_gpu_batch_size", type=int, default=512)
    p.add_argument("--passage_maxlength", type=int, default=512)
    p.add_argument("--model_name_or_path", type=str, required=True)
    p.add_argument("--no_fp16", action="store_true",
                   help="encode in f32 instead of bf16")
    p.add_argument("--no_title", action="store_true")
    p.add_argument("--lowercase", action="store_true")
    p.add_argument("--normalize_text", action="store_true")
    p.add_argument("--pooling", type=str, default="average")
    p.add_argument("--pack_rows", type=int, default=256,
                   help="length-packed encode row budget (0 = "
                        "unpacked bucketed path); corpus encode is "
                        "this tool's wall-clock")
    return p


def embed_passages(args, passages, encoder: DenseEncoder) -> tuple:
    """(ids, embeddings) for the shard
    (generate_passage_embeddings.py:26-67)."""
    ids = [p["id"] for p in passages]
    texts = []
    for p in passages:
        text = (p["text"] if args.no_title or "title" not in p
                else p["title"] + " " + p["text"])
        if args.lowercase:
            text = text.lower()
        if args.normalize_text:
            text = normalize_fn(text)
        texts.append(text)
    emb = encoder._encode_texts(texts, args.per_gpu_batch_size,
                                normalize=False)
    return ids, emb.astype(np.float32)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    init_logger(args.output_dir)
    cfg = Config(retriever_model_id=args.model_name_or_path,
                 dtype="float32" if args.no_fp16 else "bfloat16",
                 dropout=0.0, pooling=args.pooling)
    params, mcfg, tokenizer = common.resolve_model(cfg)
    params = common.init_or_load_params(cfg, mcfg, params)
    if tokenizer is None:
        raise SystemExit("model dir must provide a vocab.txt tokenizer")

    passages = load_passages(args.passages)
    if passages is None:
        raise SystemExit(f"no passages at {args.passages}")
    shard_size = len(passages) // args.num_shards
    start_idx = args.shard_id * shard_size
    end_idx = (len(passages) if args.shard_id == args.num_shards - 1
               else start_idx + shard_size)
    shard = passages[start_idx:end_idx]
    logger.info("Embedding %d passages (idx %d..%d)", len(shard), start_idx,
                end_idx)

    encoder = DenseEncoder(params, mcfg, tokenizer,
                           max_length=args.passage_maxlength,
                           pooling=args.pooling,
                           pack_rows=args.pack_rows)
    ids, emb = embed_passages(args, shard, encoder)

    os.makedirs(args.output_dir, exist_ok=True)
    save_file = os.path.join(args.output_dir,
                             args.prefix + f"_{args.shard_id:02d}")
    with open(save_file, "wb") as f:
        pickle.dump((ids, emb), f)
    logger.info("Saved %d embeddings (%s) to %s", len(ids),
                str(emb.shape), save_file)


if __name__ == "__main__":
    main(sys.argv[1:])
