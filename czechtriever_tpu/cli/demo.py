"""Interactive encoder REPL (reference demo.py).

Loads a model, reads lines from stdin, and prints the embedding of each
128-token window plus the decoded window text (demo.py:15-25).

  python -m czechtriever_tpu.cli.demo --model_path models/czert
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from czechtriever_tpu.cli import common
from czechtriever_tpu.config import Config


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, default="models/czert")
    p.add_argument("--window", type=int, default=128)
    args = p.parse_args(argv)

    print(f"Loading model from {args.model_path}")
    cfg = Config(retriever_model_id=args.model_path, dropout=0.0)
    params, mcfg, tokenizer = common.resolve_model(cfg)
    params = common.init_or_load_params(cfg, mcfg, params)
    if tokenizer is None:
        raise SystemExit("model dir must provide a vocab.txt tokenizer")
    from czechtriever_tpu.models.contriever import encode
    print("Model loaded")

    while True:
        try:
            input_text = input("Enter a text: ")
        except EOFError:
            return
        ids = np.asarray(tokenizer.encode(input_text), np.int32)[None, :]
        for start in range(0, ids.shape[1], args.window):
            w = ids[:, start:start + args.window]
            mask = np.ones_like(w)
            emb = encode(params, mcfg, w, mask, deterministic=True)
            print(f"Embedding: {np.asarray(emb)}")
            print(f"For this part of the text: "
                  f"{tokenizer.decode(list(w[0]))}")


if __name__ == "__main__":
    main(sys.argv[1:])
