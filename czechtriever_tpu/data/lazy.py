"""Lazy jsonl-backed training datasets.

Counterparts of the reference's seek-based datasets:

  * ``LazyJsonlDataset``   — /root/reference/src/data.py:164-207: a
    pickled list of byte offsets into a jsonl file; each access seeks to
    one line, tokenizes it, takes a random chunk_length window and
    builds an augmented crop pair.
  * ``LazyJsonlNoBounds``  — src/data.py:358-420: line offsets + a
    cumulative token count per line; sample i is the i-th chunk_length
    token window of the *concatenated* corpus, crossing line boundaries
    via bisect; ``generate_offset`` re-randomizes the global epoch
    offset.
  * ``build_line_index``   — offline builder for both index structures
    (the reference ships them as pre-computed pickles,
    src/options.py:88-92 offsets_file/cumsums_file).

These are tokenizer-in-the-loop paths for corpora that don't fit the
preferred uint16 binary stream (data/tokenstream.py); batches still get
padded to static shapes by the collator.
"""

from __future__ import annotations

import json
import pickle
from bisect import bisect_right
from typing import Dict, List, Optional, Tuple

import numpy as np

from czechtriever_tpu.data import augment
from czechtriever_tpu.data.normalize_text import normalize as normalize_fn


def build_line_index(path: str, tokenizer=None
                     ) -> Tuple[List[int], Optional[List[int]]]:
    """(byte offsets per line, cumulative token counts before each line).

    Cumsums follow the reference convention (src/data.py:370-378):
    entry i is the token count *before* line i; the final line's tokens
    are counted lazily by __len__. Token counts need a tokenizer; pass
    None to build offsets only.
    """
    offsets, cumsums = [], []
    total = 0
    with open(path, "rb") as f:
        while True:
            pos = f.tell()
            line = f.readline()
            if not line:
                break
            offsets.append(pos)
            if tokenizer is not None:
                cumsums.append(total)
                text = json.loads(line)["text"]
                total += len(tokenizer.encode(text,
                                              add_special_tokens=False))
    return offsets, (cumsums if tokenizer is not None else None)


def save_line_index(offsets, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(offsets, f)


def load_line_index(path: str):
    """Load a pickled line index. Accepts our plain offsets list, a
    (offsets, cumsums) tuple, or the reference's list of
    {offset, tokens_before_this_line} dicts (get_line_offsets.py /
    cli.data_tools line_offsets) — returns (offsets, cumsums-or-None)."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    if isinstance(data, tuple) and len(data) == 2:
        return data
    if data and isinstance(data[0], dict):
        return ([d["offset"] for d in data],
                [d["tokens_before_this_line"] for d in data])
    return data, None


class LazyJsonlDataset:
    """One line = one document (src/data.py:164-207)."""

    def __init__(self, path: str, tokenizer, spec, chunk_length: int,
                 offsets: Optional[List[int]] = None,
                 normalize_text: bool = False, seed: int = 0):
        self.path = path
        self.tokenizer = tokenizer
        self.spec = spec                    # datasets.AugmentSpec
        self.chunk_length = chunk_length
        self.normalize_text = normalize_text
        if offsets is None:
            offsets, _ = build_line_index(path)
        self.offsets = offsets
        self.rng = np.random.default_rng(seed)
        self._fh = open(path, "r", encoding="utf-8")

    def __len__(self) -> int:
        return len(self.offsets)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        self._fh.seek(self.offsets[index])
        text = json.loads(self._fh.readline())["text"]
        if self.normalize_text:
            text = normalize_fn(text)
        tokens = np.asarray(self.tokenizer.encode(
            text, add_special_tokens=False), np.int32)
        start = int(self.rng.integers(
            0, max(0, len(tokens) - self.chunk_length) + 1))
        window = tokens[start:start + self.chunk_length]
        return self.spec.make_pair(window, self.rng)

    def generate_offset(self) -> None:  # parity no-op (src/data.py:206)
        pass


class LazyJsonlNoBounds:
    """Windows over the concatenated token stream, crossing line
    boundaries (src/data.py:358-420)."""

    def __init__(self, path: str, tokenizer, spec, chunk_length: int,
                 offsets: List[int], cumsums: List[int],
                 normalize_text: bool = False, seed: int = 0):
        self.path = path
        self.tokenizer = tokenizer
        self.spec = spec
        self.chunk_length = chunk_length
        self.normalize_text = normalize_text
        self.offsets = offsets
        self.cumsums = cumsums
        self.offset = 0
        self.rng = np.random.default_rng(seed)
        self._fh = open(path, "r", encoding="utf-8")
        # total tokens = cumsum before last line + last line's tokens
        # (the reference recounts it on every __len__, src/data.py:371-378)
        self._fh.seek(offsets[-1])
        last = json.loads(self._fh.readline())["text"]
        self.tokens_count = cumsums[-1] + len(
            tokenizer.encode(last, add_special_tokens=False))

    def __len__(self) -> int:
        return (self.tokens_count - self.offset) // self.chunk_length

    def _line_tokens(self, file_index: int) -> List[int]:
        self._fh.seek(self.offsets[file_index])
        text = json.loads(self._fh.readline())["text"]
        if self.normalize_text:
            text = normalize_fn(text)
        return self.tokenizer.encode(text, add_special_tokens=False)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        start_idx = self.offset + index * self.chunk_length
        file_index = bisect_right(self.cumsums, start_idx) - 1
        start_in_line = start_idx - self.cumsums[file_index]
        tokens: List[int] = []
        while (len(tokens) - start_in_line < self.chunk_length
               and file_index < len(self.offsets)):
            tokens.extend(self._line_tokens(file_index))
            file_index += 1
        window = np.asarray(
            tokens[start_in_line:start_in_line + self.chunk_length],
            np.int32)
        return self.spec.make_pair(window, self.rng)

    def generate_offset(self) -> None:
        self.offset = int(self.rng.integers(0, self.chunk_length))
