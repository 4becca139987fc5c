"""Retrieval-corpus readers.

Parity with /root/reference/src/data.py:656-673 (``load_passages``: jsonl
or DPR-style tsv with (id, text, title) columns) and
src/data.py:140-160 (``load_dataset_custom``: directory of preprocessed
tokenized shard files, optionally split across shards/hosts).
"""

from __future__ import annotations

import csv
import glob
import json
import logging
import os
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def load_passages(path: str) -> Optional[List[Dict]]:
    """jsonl ({id, text, title?}) or DPR tsv (id \\t text \\t title)."""
    if not os.path.exists(path):
        logger.info("%s does not exist", path)
        return None
    passages: List[Dict] = []
    with open(path, encoding="utf-8") as fin:
        if path.endswith(".jsonl"):
            for line in fin:
                passages.append(json.loads(line))
        else:
            reader = csv.reader(fin, delimiter="\t")
            for row in reader:
                if row[0] != "id":
                    passages.append(
                        {"id": row[0], "title": row[2], "text": row[1]})
    return passages


def load_preprocessed_shards(data_path: str, loading_mode: str = "split",
                             shard_id: int = 0,
                             num_shards: int = 1) -> Optional[List[np.ndarray]]:
    """Load tokenized-doc shard files from a directory.

    Supports our ``.npz`` shard format (preprocess CLI) and the
    reference's torch-saved ``.p*`` files (loaded via torch-cpu for
    checkpoint compat). loading_mode: 'split' (np.array_split over
    shards, src/data.py:144-147), 'full', or 'single'.
    """
    files = sorted(glob.glob(os.path.join(data_path, "*.np[zy]"))
                   + glob.glob(os.path.join(data_path, "*.p*")))
    if loading_mode == "split":
        files = list(np.array_split(files, num_shards))[shard_id]
    elif loading_mode == "single":
        files = files[:1]
    elif loading_mode != "full":
        raise ValueError(f"unknown loading_mode: {loading_mode}")

    docs: List[np.ndarray] = []
    for fp in files:
        try:
            if fp.endswith(".npz"):
                with np.load(fp) as z:
                    flat, lengths = z["tokens"], z["lengths"]
                docs.extend(np.split(flat, np.cumsum(lengths)[:-1]))
            elif fp.endswith(".npy"):
                docs.extend(list(np.load(fp, allow_pickle=True)))
            else:
                import torch
                docs.extend(np.asarray(t) for t in
                            torch.load(fp, map_location="cpu"))
        except Exception:
            logger.warning("Unable to load file %s", fp)
    return docs or None


def save_preprocessed_shard(docs: List[np.ndarray], path: str) -> None:
    """Save ragged tokenized docs as a flat npz (tokens + lengths)."""
    lengths = np.array([len(d) for d in docs], dtype=np.int64)
    flat = (np.concatenate([np.asarray(d, dtype=np.int32) for d in docs])
            if docs else np.zeros((0,), np.int32))
    np.savez_compressed(path, tokens=flat, lengths=lengths)
