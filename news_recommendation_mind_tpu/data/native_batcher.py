"""ctypes bridge to the native (C++/OpenMP) batch assembler.

Compiles native/batcher.cpp on first use (g++, cached as a shared library
next to the package cache) and exposes `NativeBatcher`, a drop-in
replacement for TrainLoader's per-batch assembly. Falls back cleanly when
no compiler is available — loaders keep working pure-numpy.

The native path exists for throughput: one v5e chip consumes >800k
examples/s while the Python assembler produces ~65k/s (SURVEY §7's
input-pipeline hard part). Determinism holds per (seed, epoch, sample)
via counter-based RNG, independent of thread count — but the stream
differs from the numpy path's, so a given seed yields different (equally
valid) negative samples across backends.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

from .cache import Behaviors
from ..utils.logging import get_logger

logger = get_logger("native_batcher")

_LIB = None
_LIB_FAILED = False


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "batcher.cpp")


def _build_library(cache_dir: Optional[str] = None) -> Optional[str]:
    src = _source_path()
    if not os.path.exists(src):
        return None
    cache_dir = cache_dir or os.path.join(
        tempfile.gettempdir(), "nrm_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    lib = os.path.join(cache_dir, "libbatcher.so")
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           src, "-o", lib + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(lib + ".tmp", lib)
        return lib
    except Exception as e:
        logger.warning("native batcher build failed (%s); using numpy path",
                       e)
        return None


def get_library():
    """Load (building if needed) the shared library; None if unavailable."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    path = _build_library()
    if path is None:
        _LIB_FAILED = True
        return None
    lib = ctypes.CDLL(path)
    i64, u64, i32 = ctypes.c_int64, ctypes.c_uint64, ctypes.c_int32
    ptr = ctypes.c_void_p
    lib.batcher_create.restype = ptr
    lib.batcher_create.argtypes = [ptr] * 8 + [i64, i64, i64, i64, u64]
    lib.batcher_destroy.argtypes = [ptr]
    lib.batcher_make_batch.argtypes = [ptr, ptr, i64, u64, i32, i32] \
        + [ptr] * 10
    lib.dedup_create.restype = ptr
    lib.dedup_create.argtypes = [i64]
    lib.dedup_destroy.argtypes = [ptr]
    lib.dedup_batch.restype = i64
    lib.dedup_batch.argtypes = [ptr, ptr, i64, ptr, i64, i64, i64,
                                ptr, ptr, ptr]
    _LIB = lib
    return _LIB


def _cptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class NativeBatcher:
    """Holds the native context over the cached arrays for one split."""

    def __init__(self, behaviors: Behaviors, his_ids: np.ndarray,
                 his_mask: np.ndarray, news_tokens: np.ndarray,
                 news_attn: np.ndarray, *, npratio: int, seed: int):
        lib = get_library()
        if lib is None:
            raise RuntimeError("native batcher unavailable")
        self._lib = lib
        # keep references so numpy never frees what C++ points at
        self._arrays = dict(
            pos=np.ascontiguousarray(behaviors.pos, np.int32),
            neg_flat=np.ascontiguousarray(behaviors.neg_flat, np.int32),
            neg_offsets=np.ascontiguousarray(behaviors.neg_offsets,
                                             np.int64),
            his_ids=np.ascontiguousarray(his_ids, np.int32),
            his_mask=np.ascontiguousarray(his_mask, np.float32),
            uindex=np.ascontiguousarray(behaviors.uindex, np.int32),
            news_tokens=np.ascontiguousarray(news_tokens, np.int32),
            news_attn=np.ascontiguousarray(news_attn, np.float32),
        )
        a = self._arrays
        self.his_size = his_ids.shape[1]
        self.sl = news_tokens.shape[1]
        self.npratio = npratio
        self._dedup_ctx = None
        self._ctx = lib.batcher_create(
            _cptr(a["pos"]), _cptr(a["neg_flat"]), _cptr(a["neg_offsets"]),
            _cptr(a["his_ids"]), _cptr(a["his_mask"]), _cptr(a["uindex"]),
            _cptr(a["news_tokens"]), _cptr(a["news_attn"]),
            len(a["pos"]), self.his_size, self.sl, npratio, seed)

    def __del__(self):
        try:
            if getattr(self, "_ctx", None):
                self._lib.batcher_destroy(self._ctx)
            if getattr(self, "_dedup_ctx", None):
                self._lib.dedup_destroy(self._dedup_ctx)
        except Exception:
            pass

    def dedup_batch(self, cdd_id: np.ndarray, his_id: np.ndarray,
                    u_pad: int, u_quantum: int):
        """First-occurrence unique of the batch's article ids + inverse
        position maps (native O(n) mark-array; replaces per-batch
        np.unique). Returns (uniq_pad [width], cdd_pos, his_pos) or
        None on unique-count overflow (caller falls back)."""
        if self._dedup_ctx is None:
            n_news = self._arrays["news_tokens"].shape[0]
            self._dedup_ctx = self._lib.dedup_create(n_news)
        cdd = np.ascontiguousarray(cdd_id, np.int32)
        his = np.ascontiguousarray(his_id, np.int32)
        uniq_pad = np.empty(u_pad, np.int32)
        cdd_pos = np.empty(cdd.shape, np.int32)
        his_pos = np.empty(his.shape, np.int32)
        width = self._lib.dedup_batch(
            self._dedup_ctx, _cptr(cdd), cdd.size, _cptr(his), his.size,
            u_pad, u_quantum, _cptr(uniq_pad), _cptr(cdd_pos),
            _cptr(his_pos))
        if width < 0:
            return None
        return uniq_pad[:width], cdd_pos, his_pos

    def make_batch(self, idx: np.ndarray, epoch: int,
                   shuffle_pos: bool = False,
                   emit_tokens: bool = True) -> dict:
        bs = len(idx)
        cdd = self.npratio + 1
        idx = np.ascontiguousarray(idx, np.int64)
        tok_shape = (bs, cdd, self.sl) if emit_tokens else (1, 1, 1)
        his_tok_shape = (bs, self.his_size, self.sl) if emit_tokens \
            else (1, 1, 1)
        out = {
            "user_id": np.empty(bs, np.int32),
            "cdd_id": np.empty((bs, cdd), np.int32),
            "his_id": np.empty((bs, self.his_size), np.int32),
            "cdd_token": np.empty(tok_shape, np.int32),
            "cdd_attn": np.empty(tok_shape, np.float32),
            "his_token": np.empty(his_tok_shape, np.int32),
            "his_attn": np.empty(his_tok_shape, np.float32),
            "cdd_mask": np.empty((bs, cdd), np.float32),
            "his_mask": np.empty((bs, self.his_size), np.float32),
            "label": np.empty(bs, np.int32),
        }
        self._lib.batcher_make_batch(
            self._ctx, _cptr(idx), bs, epoch, int(shuffle_pos),
            int(emit_tokens),
            _cptr(out["user_id"]), _cptr(out["cdd_id"]),
            _cptr(out["his_id"]), _cptr(out["cdd_token"]),
            _cptr(out["cdd_attn"]), _cptr(out["his_token"]),
            _cptr(out["his_attn"]), _cptr(out["cdd_mask"]),
            _cptr(out["his_mask"]), _cptr(out["label"]))
        if not emit_tokens:
            for k in ("cdd_token", "cdd_attn", "his_token", "his_attn"):
                del out[k]
        return out
