"""ctypes bridge to the native batch pair-builder (native/pairgen.cpp).

Replaces the per-example Python crop/augment loop in the batch pipeline
with one multithreaded C++ call per batch — the TPU-native equivalent of
the reference's torch DataLoader worker processes
(/root/reference/train.py:195-202). Falls back silently when the shared
library can't be built (no compiler): ``available()`` gates usage.

The library is compiled lazily with g++ into
``native/libpairgen.so`` and cached; rebuilds happen when the source is
newer than the binary.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "pairgen.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libpairgen.so")

_AUG_KIND = {"none": 0, "mask": 1, "replace": 2, "delete": 3, "shuffle": 4}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.warning("native pairgen build failed (%s); using the "
                       "numpy path", e)
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
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        lib.build_pair_batch.restype = ctypes.c_int
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.build_pair_batch.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64,        # chunks, n, L
            ctypes.c_double, ctypes.c_double,            # ratio min/max
            ctypes.c_int, ctypes.c_double,               # aug, prob
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # mask/start/vocab
            ctypes.c_int64, ctypes.c_int64,              # bos, eos
            ctypes.c_uint64, ctypes.c_int64,             # seed, max_len
            i32p, i32p, i32p, i32p,                      # q/k ids+masks
            ctypes.c_int,                                # threads
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_pair_batch(chunks: np.ndarray, spec, seed: int, max_length: int,
                     num_threads: int = 4) -> Dict[str, np.ndarray]:
    """[N, chunk_len] int32 chunks -> {q,k}_tokens/_mask [N, max_length].

    ``spec`` is a datasets.AugmentSpec; semantics mirror
    augment.build_pair + collator.pad_batch in one native call.
    """
    lib = _load()
    assert lib is not None, "native pairgen unavailable"
    chunks = np.ascontiguousarray(chunks, np.int32)
    n, L = chunks.shape
    q_ids = np.zeros((n, max_length), np.int32)
    q_mask = np.zeros((n, max_length), np.int32)
    k_ids = np.zeros((n, max_length), np.int32)
    k_mask = np.zeros((n, max_length), np.int32)
    rc = lib.build_pair_batch(
        chunks, n, L, float(spec.ratio_min), float(spec.ratio_max),
        _AUG_KIND[spec.augmentation], float(spec.prob_augmentation),
        int(spec.mask_id or 0), int(spec.start_id or 0),
        int(spec.vocab_size or 0),
        -1 if spec.bos_token_id is None else int(spec.bos_token_id),
        -1 if spec.eos_token_id is None else int(spec.eos_token_id),
        ctypes.c_uint64(seed & (2 ** 64 - 1)).value, max_length,
        q_ids, q_mask, k_ids, k_mask, num_threads)
    if rc != 0:
        raise RuntimeError(f"build_pair_batch failed rc={rc}")
    return {"q_tokens": q_ids, "q_mask": q_mask,
            "k_tokens": k_ids, "k_mask": k_mask}
