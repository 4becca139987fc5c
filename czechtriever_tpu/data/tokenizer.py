"""Self-contained BERT WordPiece tokenizer.

The reference leans on ``transformers`` tokenizers loaded from the hub or
a local Czert directory (/root/reference/src/moco.py:226-252,
src/utils.py:268-276). This implementation reads the same ``vocab.txt``
format and reproduces HF ``BertTokenizer`` behavior (basic tokenization:
whitespace/punctuation split, optional lowercase + accent strip, CJK
isolation; then greedy longest-match WordPiece with ``##`` continuations)
so the framework has no tokenizer dependency at run time. ``load_tokenizer``
still prefers a local HF directory via transformers when one exists, for
bit-exact drop-in with existing checkpoints.
"""

from __future__ import annotations

import os
import unicodedata
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF)
            or (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F)
            or (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF)
            or (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


def _clean(text: str) -> str:
    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or (unicodedata.category(ch) == "Cc"
                                       and ch not in "\t\n\r"):
            continue
        out.append(" " if ch in "\t\n\r" or unicodedata.category(ch) == "Zs"
                   else ch)
    return "".join(out)


# --- vectorized basic tokenization ------------------------------------------
# The per-character Python loops above dominate tokenization time (~90%
# in profile). This path classifies every codepoint through a lazily
# built lookup table (exact unicodedata semantics) with numpy fancy
# indexing, so the per-char work runs at C speed; the wordpiece
# longest-match stays in Python (it was already <10% of the time).

_PUNCT, _SPACE, _DROP, _CJK, _MN = 1, 2, 4, 8, 16
_MAX_CP = 0x110000
_tables = None


def _build_tables() -> np.ndarray:
    tbl = np.zeros(_MAX_CP, np.uint8)
    for cp in range(_MAX_CP):
        ch = chr(cp)
        cat = unicodedata.category(ch)
        bits = 0
        if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) \
                or (123 <= cp <= 126) or cat.startswith("P"):
            bits |= _PUNCT
        # the slow path splits with str.split(), which also treats
        # Zl/Zp (U+2028/29) and other python-isspace chars as separators
        if ch.isspace() or cat == "Zs":
            bits |= _SPACE
        if cp == 0 or cp == 0xFFFD or (cat == "Cc" and ch not in "\t\n\r"):
            bits |= _DROP
        if _is_cjk(cp):
            bits |= _CJK
        if cat == "Mn":
            bits |= _MN
        tbl[cp] = bits
    return tbl


def _get_tables() -> np.ndarray:
    global _tables
    if _tables is None:
        _tables = _build_tables()
    return _tables


def _cps(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-32-le"), np.uint32)


def _basic_tokenize_fast(text: str, do_lower_case: bool,
                         strip_accents: bool) -> List[str]:
    """Vectorized equivalent of _basic_tokenize. Ordering notes: the
    reference lowers/NFDs per whitespace token; doing it over the whole
    cleaned text is equivalent because case mapping and NFD never
    produce whitespace or punctuation, and CJK compatibility ideographs
    (which NFD remaps) stay inside the CJK ranges."""
    tbl = _get_tables()
    cps = _cps(text)
    if cps.size == 0:
        return []
    cls = tbl[cps]
    keep = (cls & _DROP) == 0
    cps = cps[keep]
    cls = cls[keep]
    if cps.size == 0:
        return []
    # \t\n\r + Zs -> plain space
    cps = np.where((cls & _SPACE) != 0, np.uint32(32), cps)
    text = cps.tobytes().decode("utf-32-le")
    if do_lower_case:
        text = text.lower()
    if strip_accents:
        text = unicodedata.normalize("NFD", text)
    cps = _cps(text)
    cls = tbl[cps]
    if strip_accents:
        keep = (cls & _MN) == 0
        cps = cps[keep]
        cls = cls[keep]
        if cps.size == 0:
            return []
        text = cps.tobytes().decode("utf-32-le")
    is_sep = cps == 32
    is_single = (cls & (_PUNCT | _CJK)) != 0
    # token boundaries: a new token starts at a non-sep position that is
    # single-char, follows a sep/single, or is position 0
    starts = np.flatnonzero(
        ~is_sep & (is_single
                   | np.concatenate(([True], (is_sep | is_single)[:-1]))))
    if starts.size == 0:
        return []
    # token end = next sep/single boundary after the start
    boundary = np.flatnonzero(is_sep | is_single)
    if boundary.size == 0:
        return [text]
    idx = np.searchsorted(boundary, starts, side="right")
    ends = np.where(idx < boundary.size,
                    boundary[np.minimum(idx, boundary.size - 1)],
                    cps.size)
    ends = np.where(is_single[starts], starts + 1, ends)
    return [text[a:b] for a, b in zip(starts.tolist(), ends.tolist())]


class WordPieceTokenizer:
    """HF BertTokenizer-compatible (vocab.txt, [CLS]/[SEP]/[UNK]/[PAD]/[MASK])."""

    def __init__(self, vocab: Dict[str, int], do_lower_case: bool = False,
                 strip_accents: Optional[bool] = None,
                 max_word_chars: int = 100):
        self.vocab = vocab
        self.inv_vocab = {v: k for k, v in vocab.items()}
        self.do_lower_case = do_lower_case
        # HF default: strip accents iff lowercasing, unless overridden
        self.strip_accents = (do_lower_case if strip_accents is None
                              else strip_accents)
        self.max_word_chars = max_word_chars
        self.pad_token_id = vocab.get("[PAD]", 0)
        self.unk_token_id = vocab.get("[UNK]")
        self.cls_token_id = vocab.get("[CLS]")
        self.sep_token_id = vocab.get("[SEP]")
        self.mask_token_id = vocab.get("[MASK]")
        # reference maps bos/eos onto CLS/SEP for BERT models
        # (src/moco.py:244-248)
        self.bos_token_id = self.cls_token_id
        self.eos_token_id = self.sep_token_id

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    @classmethod
    def from_vocab_file(cls, path: str, **kw) -> "WordPieceTokenizer":
        vocab: Dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                tok = line.rstrip("\n")
                if tok:
                    vocab[tok] = i
        return cls(vocab, **kw)

    @classmethod
    def from_pretrained(cls, model_dir: str) -> "WordPieceTokenizer":
        import json
        kw = {}
        cfg_path = os.path.join(model_dir, "tokenizer_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                tc = json.load(f)
            kw["do_lower_case"] = bool(tc.get("do_lower_case", False))
            if tc.get("strip_accents") is not None:
                kw["strip_accents"] = tc["strip_accents"]
        return cls.from_vocab_file(os.path.join(model_dir, "vocab.txt"), **kw)

    # -- basic tokenization -------------------------------------------------
    def _basic_tokenize(self, text: str) -> List[str]:
        return _basic_tokenize_fast(text, self.do_lower_case,
                                    self.strip_accents)

    def _basic_tokenize_slow(self, text: str) -> List[str]:
        """Per-character reference implementation; kept as the
        equivalence oracle for the vectorized path."""
        text = _clean(text)
        # isolate CJK chars (mBERT-style)
        chars = []
        for ch in text:
            if _is_cjk(ord(ch)):
                chars.append(f" {ch} ")
            else:
                chars.append(ch)
        tokens = "".join(chars).split()
        out: List[str] = []
        for tok in tokens:
            if self.do_lower_case:
                tok = tok.lower()
            if self.strip_accents:
                tok = "".join(c for c in unicodedata.normalize("NFD", tok)
                              if unicodedata.category(c) != "Mn")
            # split on punctuation
            cur: List[str] = []
            for ch in tok:
                if _is_punctuation(ch):
                    if cur:
                        out.append("".join(cur))
                        cur = []
                    out.append(ch)
                else:
                    cur.append(ch)
            if cur:
                out.append("".join(cur))
        return out

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > self.max_word_chars:
            return [self.unk_token_id]
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur_id = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur_id = self.vocab[sub]
                    break
                end -= 1
            if cur_id is None:
                return [self.unk_token_id]
            ids.append(cur_id)
            start = end
        return ids

    # -- public API ---------------------------------------------------------
    def encode(self, text: str, add_special_tokens: bool = True,
               max_length: Optional[int] = None,
               truncation: bool = False) -> List[int]:
        ids: List[int] = []
        for word in self._basic_tokenize(text):
            ids.extend(self._wordpiece(word))
        if add_special_tokens:
            if truncation and max_length is not None:
                ids = ids[: max_length - 2]
            ids = [self.cls_token_id] + ids + [self.sep_token_id]
        elif truncation and max_length is not None:
            ids = ids[:max_length]
        return ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        special = {self.pad_token_id, self.cls_token_id, self.sep_token_id}
        toks = []
        for i in ids:
            if skip_special_tokens and i in special:
                continue
            toks.append(self.inv_vocab.get(int(i), "[UNK]"))
        out = ""
        for t in toks:
            if t.startswith("##"):
                out += t[2:]
            else:
                out += (" " if out else "") + t
        return out

    def batch_encode(self, texts: Sequence[str], max_length: int = 512,
                     add_special_tokens: bool = True, padding: bool = True,
                     truncation: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (ids [B, L], mask [B, L]) padded to longest (≤ max_length).

        Batches route through the native C++ tokenizer when available
        (native/wordpiece.cpp — multithreaded greedy WordPiece over the
        same Unicode tables this class uses; texts the per-char table
        treatment can't reproduce exactly come back flagged and are
        re-encoded here). Differential equality is pinned in
        tests/test_tokenizer.py."""
        texts = list(texts)
        native = self._native_batch(texts, max_length, add_special_tokens,
                                    truncation) if truncation else None
        if native is not None:
            out_ids, lens = native
            seqs = [out_ids[i, :lens[i]] if lens[i] >= 0
                    else np.asarray(self.encode(texts[i],
                                                add_special_tokens,
                                                max_length, truncation),
                                    np.int32)
                    for i in range(len(texts))]
        else:
            seqs = [self.encode(t, add_special_tokens, max_length,
                                truncation) for t in texts]
        L = max(len(s) for s in seqs) if padding else max_length
        ids = np.full((len(seqs), L), self.pad_token_id, np.int32)
        mask = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            ids[i, :len(s)] = s
            mask[i, :len(s)] = 1
        return ids, mask

    def _native_batch(self, texts, max_length, add_special_tokens,
                      truncation):
        """Native tokenizer call, or None when unavailable / vocab not
        dense / batch too small to matter."""
        if len(texts) < 16 or self.unk_token_id is None:
            return None
        from czechtriever_tpu.data import native_tokenizer as nt
        if not nt.available():
            return None
        if getattr(self, "_native", None) is None:
            try:
                vals = sorted(self.vocab.values())
                if vals[0] != 0 or vals[-1] != len(vals) - 1:
                    return None  # sparse ids: keep the Python path
                self._native = nt.NativeWordPiece(
                    self.vocab, self.unk_token_id, self.max_word_chars)
            except Exception:
                self._native = None
                return None
        if self._native is None:
            return None
        return self._native.encode_batch(
            texts, lower=self.do_lower_case, strip=self.strip_accents,
            add_special=add_special_tokens,
            cls_id=self.cls_token_id or 0, sep_id=self.sep_token_id or 0,
            pad_id=self.pad_token_id, max_length=max_length,
            truncation=truncation)

    def __call__(self, texts, **kw):
        if isinstance(texts, str):
            texts = [texts]
        ids, mask = self.batch_encode(texts, **kw)
        return {"input_ids": ids, "attention_mask": mask}


def batch_encode_any(tokenizer, texts: Sequence[str],
                     max_length: int = 512,
                     add_special_tokens: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """(ids, mask) from either the native WordPieceTokenizer or a
    transformers tokenizer — ``load_tokenizer`` can return both, and HF
    tokenizers have no ``batch_encode`` method (found the hard way when
    the embed CLI met a BertTokenizerFast)."""
    if hasattr(tokenizer, "batch_encode"):
        return tokenizer.batch_encode(texts, max_length=max_length,
                                      add_special_tokens=add_special_tokens)
    out = tokenizer(list(texts), padding=True, truncation=True,
                    max_length=max_length,
                    add_special_tokens=add_special_tokens,
                    return_tensors="np")
    return (np.asarray(out["input_ids"], np.int32),
            np.asarray(out["attention_mask"], np.int32))


def load_tokenizer(path_or_id: str):
    """Local-first tokenizer resolution (src/utils.py:268-276 semantics):
    prefer a transformers fast tokenizer from a local dir, fall back to
    the native WordPiece implementation reading vocab.txt."""
    if os.path.isdir(path_or_id):
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path_or_id,
                                                local_files_only=True)
            if tok.bos_token_id is None and hasattr(tok, "cls_token_id"):
                tok.bos_token = tok.cls_token or "[CLS]"
            if tok.eos_token_id is None and hasattr(tok, "sep_token_id"):
                tok.eos_token = tok.sep_token or "[SEP]"
            return tok
        except Exception:
            return WordPieceTokenizer.from_pretrained(path_or_id)
    raise FileNotFoundError(
        f"tokenizer '{path_or_id}' not found locally (no network access)")
