"""ctypes bridge to the native batch WordPiece tokenizer
(native/wordpiece.cpp).

Same lazy-build pattern as native_loader.py (g++ -> .so, silent
fallback). Unicode semantics travel as DATA: the classification /
lowercase / NFD tables are built HERE with the exact ``unicodedata``
calls the Python tokenizer uses, so the two paths agree by
construction. Codepoints whose per-char treatment cannot reproduce
Python's string-level behavior (context-sensitive Greek sigma
lowercasing; non-Mn combining marks that string NFD may reorder) carry
a RISKY bit — the native encoder refuses such texts (len = -1) and the
caller re-encodes them in Python. In Czech/English corpora these are
vanishingly rare; correctness never depends on that.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
import unicodedata
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "wordpiece.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libwordpiece.so")

_RISKY = 32
_MAX_CP = 0x110000

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_tables = None  # (cls u8, lower_offs i32, lower_blob u32, nfd_offs, nfd_blob)


def _build_lib() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.warning("native wordpiece build failed (%s); using the "
                       "Python tokenizer", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build_lib():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            logger.warning("native wordpiece load failed: %s", e)
            return None
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32]
        lib.wp_free.argtypes = [ctypes.c_void_p]
        lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _build_tables():
    """Classification bits (same layout as tokenizer._build_tables,
    plus the RISKY bit) + full 1->N lowercase and NFD maps."""
    global _tables
    if _tables is not None:
        return _tables
    # disk cache: the 1.1M-codepoint chr()/lower()/NFD sweep costs
    # ~10 s of Python; the result depends only on the unicodedata
    # version baked into this interpreter
    cache = os.path.expanduser(
        "~/.cache/czechtriever_tpu/"
        f"wp_tables_{unicodedata.unidata_version}.npz")
    try:
        with np.load(cache) as z:
            _tables = (z["cls"], z["lo_offs"], z["lo_blob"],
                       z["nf_offs"], z["nf_blob"])
            return _tables
    except Exception:
        pass
    from czechtriever_tpu.data.tokenizer import _get_tables
    cls = _get_tables().copy()  # PUNCT|SPACE|DROP|CJK|MN bits
    lower_offs = np.zeros(_MAX_CP + 1, np.int32)
    nfd_offs = np.zeros(_MAX_CP + 1, np.int32)
    lower_parts = []
    nfd_parts = []
    lo_total = 0
    nf_total = 0
    for cp in range(_MAX_CP):
        ch = chr(cp)
        lo = ch.lower()
        nf = unicodedata.normalize("NFD", ch)
        if lo == ch:
            lo_cps = (cp,)
        else:
            lo_cps = tuple(ord(c) for c in lo)
        if nf == ch:
            nf_cps = (cp,)
        else:
            nf_cps = tuple(ord(c) for c in nf)
        lower_parts.append(lo_cps)
        nfd_parts.append(nf_cps)
        lo_total += len(lo_cps)
        nf_total += len(nf_cps)
        lower_offs[cp + 1] = lo_total
        nfd_offs[cp + 1] = nf_total
        # RISKY: context-sensitive lowercase (final sigma), or a
        # combining char that is NOT Mn (string NFD may canonically
        # reorder it relative to the Mn marks we drop)
        if cp == 0x03A3 or (unicodedata.combining(ch)
                            and unicodedata.category(ch) != "Mn"):
            cls[cp] |= _RISKY
    lower_blob = np.fromiter(
        (c for seq in lower_parts for c in seq), np.uint32, lo_total)
    nfd_blob = np.fromiter(
        (c for seq in nfd_parts for c in seq), np.uint32, nf_total)
    _tables = (np.ascontiguousarray(cls), lower_offs, lower_blob,
               nfd_offs, nfd_blob)
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, cls=_tables[0], lo_offs=_tables[1],
                 lo_blob=_tables[2], nf_offs=_tables[3],
                 nf_blob=_tables[4])
    except Exception:
        pass
    return _tables


class NativeWordPiece:
    """Per-vocab native tokenizer handle."""

    def __init__(self, vocab: dict, unk_id: int, max_word_chars: int):
        lib = _load()
        assert lib is not None
        self._lib = lib
        toks = sorted(vocab.items(), key=lambda kv: kv[1])
        # ids must be dense 0..n-1 for the id == insertion-index scheme
        assert toks and toks[0][1] == 0 and toks[-1][1] == len(toks) - 1, \
            "native tokenizer needs a dense contiguous vocab"
        blob = b"".join(t.encode("utf-8") for t, _ in toks)
        offs = np.zeros(len(toks) + 1, np.int64)
        pos = 0
        for i, (t, _) in enumerate(toks):
            pos += len(t.encode("utf-8"))
            offs[i + 1] = pos
        self._blob = np.frombuffer(blob, np.uint8)  # keep alive
        self._offs = offs
        self._h = lib.wp_create(
            self._blob.ctypes.data_as(ctypes.c_void_p),
            offs.ctypes.data_as(ctypes.c_void_p),
            len(toks), unk_id, max_word_chars)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.wp_free(self._h)
        except Exception:
            pass

    def encode_batch(self, texts, *, lower: bool, strip: bool,
                     add_special: bool, cls_id: int, sep_id: int,
                     pad_id: int, max_length: int, truncation: bool,
                     n_threads: int = 0
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (ids [B, max_length] pad-filled, lens [B]); lens[i] == -1
        marks a RISKY text the caller must encode in Python."""
        cls, lo_offs, lo_blob, nf_offs, nf_blob = _build_tables()
        blob = "".join(texts).encode("utf-32-le")
        cps = np.frombuffer(blob, np.uint32)
        offs = np.zeros(len(texts) + 1, np.int64)
        pos = 0
        for i, t in enumerate(texts):
            pos += len(t)  # python str len == codepoint count
            offs[i + 1] = pos
        out_ids = np.full((len(texts), max_length), pad_id, np.int32)
        out_lens = np.zeros(len(texts), np.int32)
        if n_threads <= 0:
            n_threads = min(8, os.cpu_count() or 1)
        self._lib.wp_encode_batch(
            self._h,
            cps.ctypes.data_as(ctypes.c_void_p),
            offs.ctypes.data_as(ctypes.c_void_p), len(texts),
            cls.ctypes.data_as(ctypes.c_void_p),
            lo_offs.ctypes.data_as(ctypes.c_void_p),
            lo_blob.ctypes.data_as(ctypes.c_void_p),
            nf_offs.ctypes.data_as(ctypes.c_void_p),
            nf_blob.ctypes.data_as(ctypes.c_void_p),
            int(lower), int(strip), int(add_special),
            cls_id, sep_id, max_length, int(truncation), n_threads,
            out_ids.ctypes.data_as(ctypes.c_void_p),
            out_lens.ctypes.data_as(ctypes.c_void_p))
        return out_ids, out_lens
