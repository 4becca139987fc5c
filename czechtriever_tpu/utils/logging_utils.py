"""Observability sinks: rank-gated logging, TensorBoard, JSONL metrics.

Parity with the reference's three sinks (SURVEY.md §5.5): python logging
to stdout + <output_dir>/run.log at INFO on the main process / WARN
elsewhere (src/utils.py:24-40), optional TensorBoard
(src/utils.py:279-291 — fixed: the reference calls it with one arg,
train.py:154, a TypeError), plus a dependency-free JSONL metrics file
that always works (replacing ClearML, train.py:30-40).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional

from czechtriever_tpu.parallel.mesh import is_main

logger = logging.getLogger("czechtriever_tpu")


def init_logger(output_dir: Optional[str] = None,
                stdout_only: bool = False) -> logging.Logger:
    handlers = [logging.StreamHandler(sys.stdout)]
    if not stdout_only and output_dir:
        os.makedirs(output_dir, exist_ok=True)
        handlers.append(
            logging.FileHandler(os.path.join(output_dir, "run.log")))
    logging.basicConfig(
        datefmt="%m/%d/%Y %H:%M:%S",
        level=logging.INFO if is_main() else logging.WARN,
        format="[%(asctime)s] {%(filename)s:%(lineno)d} "
               "%(levelname)s - %(message)s",
        handlers=handlers, force=True)
    return logger


def init_tb_logger(output_dir: str, main: Optional[bool] = None):
    """TensorBoard writer on the main process, None if unavailable."""
    main = is_main() if main is None else main
    try:
        from torch.utils import tensorboard
        return tensorboard.SummaryWriter(output_dir) if main else None
    except Exception:
        logger.warning("Tensorboard is not available.")
        return None


class JsonlMetricsWriter:
    """Append-only metrics sink: one JSON object per log call."""

    def __init__(self, output_dir: str, name: str = "metrics.jsonl"):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, name)

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({(f"{prefix}/{k}" if prefix else k): float(v)
                    for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


class MetricsLogger:
    """Fan-out to all sinks (log line + TB + JSONL)."""

    def __init__(self, output_dir: str, tb: bool = True):
        self.output_dir = output_dir
        self.tb = init_tb_logger(output_dir) if tb else None
        self.jsonl = JsonlMetricsWriter(output_dir) if is_main() else None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        if not is_main():
            return
        if self.jsonl:
            self.jsonl.log(step, metrics, prefix)
        if self.tb:
            for k, v in metrics.items():
                self.tb.add_scalar(f"{prefix}/{k}" if prefix else k,
                                   float(v), step)

    def close(self):
        if self.tb:
            self.tb.close()
