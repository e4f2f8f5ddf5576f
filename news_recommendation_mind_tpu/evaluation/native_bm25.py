"""ctypes bridge to the native (C++/OpenMP) BM25 top-k recall kernel.

Compiles native/bm25_topk.cpp on first use (g++, cached next to the other
native libraries) and exposes ``bm25_topk_native``, the hot loop of
``evaluation.recall.bm25_rank`` (reference utils/utils.py:219-410). Falls
back cleanly — callers keep the scipy CSR path when no compiler is
available. Output is pinned identical to the scipy formulation by
tests/test_recall.py::test_bm25_rank_native_equals_scipy.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import tempfile
from typing import List, Optional

import numpy as np

from ..utils.logging import get_logger

logger = get_logger("native_bm25")

_LIB = None
_LIB_FAILED = False


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "bm25_topk.cpp")


_CFLAGS = ["-O3", "-march=native", "-fopenmp", "-shared", "-fPIC"]


def _cache_dir() -> str:
    """User-owned cache dir (never the shared world-writable tmp root:
    another user pre-creating a predictable path there could plant a
    crafted .so for CDLL to load — round-3 advisor medium finding)."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    path = os.path.join(base, "nrm_tpu_native")
    os.makedirs(path, exist_ok=True)
    if hasattr(os, "geteuid") and os.stat(path).st_uid != os.geteuid():
        # pre-existing dir owned by someone else — refuse to trust it
        path = tempfile.mkdtemp(prefix="nrm_tpu_native_")
    return path


def _build_library() -> Optional[str]:
    src = _source_path()
    if not os.path.exists(src):
        return None
    cache_dir = _cache_dir()
    with open(src, "rb") as f:
        source = f.read()
    # content+flags+host fingerprint in the name: a source edit, a flag
    # change, or a different host CPU (-march=native binaries SIGILL
    # elsewhere) each miss the cache instead of loading a stale binary
    tag = hashlib.sha256(
        source + " ".join(_CFLAGS).encode()
        + (platform.machine() + platform.processor()).encode()
    ).hexdigest()[:16]
    lib = os.path.join(cache_dir, f"libbm25topk-{tag}.so")
    if os.path.exists(lib):
        return lib
    # unique scratch name per process: concurrent builders (e.g. the
    # two-process eval test) never interleave writes into one file; the
    # publish stays atomic via os.replace
    tmp = f"{lib}.tmp.{os.getpid()}"
    cmd = ["g++", *_CFLAGS, src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, lib)
        return lib
    except Exception as e:
        logger.warning("native bm25 build failed (%s); using scipy path", e)
        try:
            if os.path.exists(tmp):
                os.remove(tmp)
        except OSError:
            pass
        return None


def get_library():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    path = _build_library()
    if path is None:
        _LIB_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.bm25_topk.restype = None
        lib.bm25_topk.argtypes = [
            ctypes.POINTER(ctypes.c_double),   # inv [vocab, K, 2]
            ctypes.c_int64, ctypes.c_int64,    # vocab, postings_k
            ctypes.POINTER(ctypes.c_int32),    # news_tokens [n_articles, S]
            ctypes.c_int64, ctypes.c_int64,    # n_articles, sl
            ctypes.POINTER(ctypes.c_int64),    # his_offs [n_impr + 1]
            ctypes.POINTER(ctypes.c_int32),    # his_flat
            ctypes.c_int64, ctypes.c_int64,    # n_impr, top_k
            ctypes.POINTER(ctypes.c_int64),    # out_ids [n_impr, top_k]
            ctypes.POINTER(ctypes.c_int32),    # out_counts [n_impr]
        ]
        _LIB = lib
    except Exception as e:
        logger.warning("native bm25 load failed (%s); using scipy path", e)
        _LIB_FAILED = True
    return _LIB


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def bm25_topk_native(inv: np.ndarray, news_tokens: np.ndarray,
                     his_offsets: np.ndarray, his_flat: np.ndarray,
                     top_k: int) -> Optional[List[np.ndarray]]:
    """Run the native kernel; None if the library is unavailable."""
    lib = get_library()
    if lib is None:
        return None
    inv = np.ascontiguousarray(inv, np.float64)
    news_tokens = np.ascontiguousarray(news_tokens, np.int32)
    his_offsets = np.ascontiguousarray(his_offsets, np.int64)
    his_flat = np.ascontiguousarray(his_flat, np.int32)
    n_impr = len(his_offsets) - 1
    out_ids = np.empty((n_impr, top_k), np.int64)
    out_counts = np.empty(n_impr, np.int32)
    lib.bm25_topk(
        _ptr(inv, ctypes.c_double),
        ctypes.c_int64(inv.shape[0]), ctypes.c_int64(inv.shape[1]),
        _ptr(news_tokens, ctypes.c_int32),
        ctypes.c_int64(news_tokens.shape[0]),
        ctypes.c_int64(news_tokens.shape[1]),
        _ptr(his_offsets, ctypes.c_int64),
        _ptr(his_flat, ctypes.c_int32),
        ctypes.c_int64(n_impr), ctypes.c_int64(top_k),
        _ptr(out_ids, ctypes.c_int64),
        _ptr(out_counts, ctypes.c_int32),
    )
    return [out_ids[j, :out_counts[j]].copy() for j in range(n_impr)]
