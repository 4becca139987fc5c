"""Offline data utilities (reference data_scripts/).

Subcommands:
  * ``split``        — random train/valid split of a jsonl corpus,
    keeping only the text field (split_data.py / create_splits.py).
  * ``line_offsets`` — byte offset + cumulative-token index for a jsonl
    file, pickled in the reference's list-of-dicts format
    (get_line_offsets.py; consumed by data/lazy.py).
  * ``unify_logs``   — scrape NDCG/MAP/Recall/P@k metric lines from run
    logs under a directory into one CSV (unify_logs.py, sans pandas).
  * ``data_hist``    — token-length histogram of a jsonl corpus as CSV
    (create_data_hist.py).
  * ``xmkqa``        — split an MKQA jsonl into per-language QA eval
    files with English answers (preprocess_xmkqa.py).

The but-lcc uint16-stream preprocessor (preprocess_but_lcc.py) lives in
``cli.preprocess --format stream``.
"""

from __future__ import annotations

import argparse
import csv
import json
import logging
import os
import pickle
import re
import sys
from collections import Counter, defaultdict

import numpy as np

logger = logging.getLogger(__name__)


def split_jsonl(input_file: str, train_file: str, valid_file: str,
                validation_samples: int, total_samples: int,
                seed: int = 42) -> None:
    """split_data.py semantics: sample validation line indices, keep only
    the text field."""
    rng = np.random.default_rng(seed)
    valid_idx = set(rng.choice(total_samples, validation_samples,
                               replace=False).tolist())
    with open(input_file, encoding="utf-8") as f, \
            open(train_file, "w", encoding="utf-8") as tf, \
            open(valid_file, "w", encoding="utf-8") as vf:
        for i, line in enumerate(f):
            d = {"text": json.loads(line)["text"]}
            out = json.dumps(d, ensure_ascii=False) + "\n"
            (vf if i in valid_idx else tf).write(out)


def line_offsets(input_file: str, output_file: str,
                 tokenizer_path: str) -> None:
    """get_line_offsets.py: [{offset, tokens_before_this_line}] pickle."""
    from czechtriever_tpu.cli.preprocess import resolve_tokenizer
    tokenizer = resolve_tokenizer(tokenizer_path)
    records = []
    cumsum = 0
    offset = 0
    with open(input_file, "rb") as f:
        for line in f:
            records.append({"offset": offset,
                            "tokens_before_this_line": cumsum})
            offset += len(line)
            text = json.loads(line)["text"]
            cumsum += len(tokenizer.encode(text, add_special_tokens=False))
    with open(output_file, "wb") as f:
        pickle.dump(records, f)
    logger.info("Wrote %d line records to %s", len(records), output_file)


_METRIC_RE = re.compile(
    r"(NDCG|MAP|Recall|P)@(\d+):\s*(\d+\.\d+)")


def unify_logs(input_dir: str, output_file: str,
               log_pattern: str = "run.log") -> None:
    """unify_logs.py: scrape metric lines from <model>/run.log files."""
    rows = []
    for root, _dirs, files in os.walk(input_dir):
        for fn in files:
            if fn != log_pattern:
                continue
            model = os.path.basename(root)
            with open(os.path.join(root, fn), encoding="utf-8",
                      errors="replace") as f:
                for line in f:
                    m = _METRIC_RE.search(line)
                    if m:
                        rows.append((model, m.group(1), int(m.group(2)),
                                     float(m.group(3))))
    rows.sort()
    os.makedirs(os.path.dirname(os.path.abspath(output_file)),
                exist_ok=True)
    with open(output_file, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["model", "metric", "k", "value"])
        w.writerows(rows)
    logger.info("Unified %d metric rows into %s", len(rows), output_file)


def data_hist(input_file: str, output_file: str,
              tokenizer_path: str) -> None:
    """create_data_hist.py: token-length histogram CSV."""
    from czechtriever_tpu.cli.preprocess import resolve_tokenizer
    tokenizer = resolve_tokenizer(tokenizer_path)
    counter: Counter = Counter()
    with open(input_file, encoding="utf-8") as f:
        for line in f:
            n = len(tokenizer.encode(json.loads(line)["text"],
                                     add_special_tokens=False))
            counter[n] += 1
    with open(output_file, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["token_length", "count"])
        for length in sorted(counter):
            w.writerow([length, counter[length]])


MKQA_LANGS = ["en", "ar", "fi", "ja", "ko", "ru", "es", "sv", "he", "th",
              "da", "de", "fr", "it", "nl", "pl", "pt", "hu", "vi", "ms",
              "km", "no", "tr", "zh_cn", "zh_hk", "zh_tw"]


def preprocess_xmkqa(input_path: str, output_dir: str) -> None:
    """preprocess_xmkqa.py: per-language question files with the English
    answer aliases; unanswerable/binary/long_answer examples dropped."""
    os.makedirs(output_dir, exist_ok=True)
    langdata = defaultdict(list)
    with open(input_path, encoding="utf-8") as fin:
        for line in fin:
            ex = json.loads(line)
            answers = []
            keep = False
            for a in ex["answers"]["en"]:
                if a["type"] not in ("unanswerable", "binary",
                                     "long_answer"):
                    keep = True
                    answers.extend(a.get("aliases", []))
                    answers.append(a.get("text"))
            if not keep:
                continue
            for lang in MKQA_LANGS:
                langdata[lang].append({
                    "id": ex["example_id"], "lang": lang,
                    "question": ex["queries"][lang],
                    "answers": answers})
    for lang, data in langdata.items():
        with open(os.path.join(output_dir, f"{lang}.jsonl"), "w",
                  encoding="utf-8") as fout:
            for ex in data:
                fout.write(json.dumps(ex, ensure_ascii=False) + "\n")


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("split")
    s.add_argument("--input_file", required=True)
    s.add_argument("--train_file", required=True)
    s.add_argument("--valid_file", required=True)
    s.add_argument("--validation_samples", type=int, default=32768)
    s.add_argument("--total_samples", type=int, required=True)
    s.add_argument("--seed", type=int, default=42)

    o = sub.add_parser("line_offsets")
    o.add_argument("--input_file", required=True)
    o.add_argument("--output_file", required=True)
    o.add_argument("--tokenizer_path", required=True)

    u = sub.add_parser("unify_logs")
    u.add_argument("--input_dir", default="baselines")
    u.add_argument("--output_file", default="baselines/unified_metrics.csv")
    u.add_argument("--log_pattern", default="run.log")

    h = sub.add_parser("data_hist")
    h.add_argument("--input_file", required=True)
    h.add_argument("--output_file", required=True)
    h.add_argument("--tokenizer_path", required=True)

    x = sub.add_parser("xmkqa")
    x.add_argument("input_path")
    x.add_argument("output_dir")

    args = p.parse_args(argv)
    if args.cmd == "split":
        split_jsonl(args.input_file, args.train_file, args.valid_file,
                    args.validation_samples, args.total_samples, args.seed)
    elif args.cmd == "line_offsets":
        line_offsets(args.input_file, args.output_file,
                     args.tokenizer_path)
    elif args.cmd == "unify_logs":
        unify_logs(args.input_dir, args.output_file, args.log_pattern)
    elif args.cmd == "data_hist":
        data_hist(args.input_file, args.output_file, args.tokenizer_path)
    elif args.cmd == "xmkqa":
        preprocess_xmkqa(args.input_path, args.output_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
