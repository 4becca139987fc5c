"""Recompute R@k from saved retrieval output files
(reference evaluate_retrieved_passages.py:31-55).

Reads the enriched jsonl written by cli.retrieve and re-runs the
answer-string validation, printing R@5/10/20/100 per file plus the
reference's tab-joined R@20 / R@100 summary rows.
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import sys

from czechtriever_tpu.evaluation import qa

logger = logging.getLogger(__name__)


def validate(data, workers_num: int):
    match_stats = qa.calculate_matches(data, workers_num)
    return [v / len(data) for v in match_stats.top_k_hits]


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, type=str,
                   help="glob over retrieval output jsonl files")
    p.add_argument("--validation_workers", type=int, default=16)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    datapaths = sorted(glob.glob(args.data))
    r20, r100 = [], []
    for path in datapaths:
        data = []
        with open(path, encoding="utf-8") as fin:
            for line in fin:
                data.append(json.loads(line))
        top_k_hits = validate(data, args.validation_workers)
        message = f"Evaluate results from {path}:"
        for k in (5, 10, 20, 100):
            if k <= len(top_k_hits):
                recall = 100 * top_k_hits[k - 1]
                if k == 20:
                    r20.append(f"{recall:.1f}")
                if k == 100:
                    r100.append(f"{recall:.1f}")
                message += f" R@{k}: {recall:.1f}"
        logger.info(message)
    print(datapaths)
    print("\t".join(r20))
    print("\t".join(r100))


if __name__ == "__main__":
    main(sys.argv[1:])
