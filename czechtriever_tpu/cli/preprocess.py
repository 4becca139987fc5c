"""Offline tokenization CLI (reference preprocess.py).

Tokenizes a jsonl corpus ({"text": ...} per line) with the native
WordPiece tokenizer (no special tokens, preprocess.py:35-37, optional
unicode normalization) and writes either

  * ``--format shards``: a ragged-doc ``.npz`` shard (tokens+lengths,
    the torch.save-pkl equivalent, loadable by
    data.passages.load_preprocessed_shards), or
  * ``--format stream``: a flat uint16-LE token stream
    (data_scripts/preprocess_but_lcc.py format, consumed by
    data.tokenstream.TokenStream).

Usage:
  python -m czechtriever_tpu.cli.preprocess \\
      --datapath corpus.jsonl --outdir data/ --tokenizer models/czert \\
      --format stream
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np

from czechtriever_tpu.data.normalize_text import normalize
from czechtriever_tpu.data.passages import save_preprocessed_shard
from czechtriever_tpu.data.tokenizer import (WordPieceTokenizer,
                                             load_tokenizer)
from czechtriever_tpu.data.tokenstream import write_token_file

logger = logging.getLogger(__name__)


def apply_tokenizer(path: str, tokenizer, normalize_text: bool = False):
    """jsonl -> list of int32 token arrays (preprocess.py:23-48)."""
    alltokens = []
    with open(path, encoding="utf-8") as fin:
        for line in fin:
            text = json.loads(line)["text"]
            if normalize_text:
                text = normalize(text)
            ids = tokenizer.encode(text, add_special_tokens=False)
            alltokens.append(np.asarray(ids, np.int32))
    return alltokens


def resolve_tokenizer(name: str):
    if os.path.isdir(name):
        try:
            return load_tokenizer(name)
        except Exception:
            return WordPieceTokenizer.from_vocab_file(
                os.path.join(name, "vocab.txt"))
    if name == "czert" and os.path.isdir("models/czert"):
        return load_tokenizer("models/czert")
    if os.path.isfile(name):  # bare vocab.txt
        return WordPieceTokenizer.from_vocab_file(name)
    raise SystemExit(f"tokenizer {name!r} not found locally")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--datapath", type=str, required=True)
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--tokenizer", type=str, required=True)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--normalize_text", action="store_true")
    p.add_argument("--format", choices=("shards", "stream"),
                   default="shards")
    args, _ = p.parse_known_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    filename = os.path.basename(args.datapath)
    ext = ".npz" if args.format == "shards" else ".u16bin"
    savepath = os.path.join(args.outdir, f"{filename}{ext}")
    if os.path.exists(savepath) and not args.overwrite:
        logger.info("File %s already exists, exiting", savepath)
        return
    os.makedirs(args.outdir, exist_ok=True)

    tokenizer = resolve_tokenizer(args.tokenizer)
    logger.info("Encoding %s...", args.datapath)
    docs = apply_tokenizer(args.datapath, tokenizer,
                           normalize_text=args.normalize_text)
    logger.info("Saving %d docs at %s...", len(docs), savepath)
    if args.format == "shards":
        save_preprocessed_shard(docs, savepath)
    else:
        flat = (np.concatenate(docs) if docs else np.zeros((0,), np.int32))
        write_token_file(flat, savepath)


if __name__ == "__main__":
    main(sys.argv[1:])
