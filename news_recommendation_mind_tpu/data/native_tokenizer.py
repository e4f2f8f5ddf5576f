"""ctypes bridge to the native (C++/OpenMP) tokenizer.

The cache-build counterpart of native_batcher: HF's Rust tokenizers
(reference utils/MIND.py:90-91) become native/tokenizer.cpp — identical
semantics to data/tokenizer.py's WordTokenizer, compiled on demand and
used transparently by `encode_corpus` for the one-time news.tsv pass
(OpenMP over articles). Falls back to the Python tokenizer when no
compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Sequence, Tuple

import numpy as np

from .tokenizer import WordTokenizer
from ..utils.logging import get_logger

logger = get_logger("native_tokenizer")

_LIB = None
_LIB_FAILED = False


def _build_library() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(here, "native", "tokenizer.cpp")
    if not os.path.exists(src):
        return None
    cache_dir = os.path.join(tempfile.gettempdir(), "nrm_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    lib = os.path.join(cache_dir, "libtokenizer.so")
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           src, "-o", lib + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(lib + ".tmp", lib)
        return lib
    except Exception as e:
        logger.warning("native tokenizer build failed (%s)", e)
        return None


def get_library():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    path = _build_library()
    if path is None:
        _LIB_FAILED = True
        return None
    lib = ctypes.CDLL(path)
    i64, i32 = ctypes.c_int64, ctypes.c_int32
    ptr = ctypes.c_void_p
    lib.tokenizer_create.restype = ptr
    lib.tokenizer_create.argtypes = [ctypes.c_char_p, i64, i32, i32, i32,
                                     i32]
    lib.tokenizer_destroy.argtypes = [ptr]
    lib.tokenizer_encode_batch.argtypes = [
        ptr, ctypes.c_char_p, i64, i64, i64, ptr, ptr]
    _LIB = lib
    return _LIB


def encode_corpus(tokenizer: WordTokenizer, texts: Sequence[str],
                  max_length: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Tokenize all texts natively → (ids [n, L] int32, attn [n, L] uint8).

    Returns None when the native library is unavailable (callers fall
    back to the per-article Python encode).
    """
    lib = get_library()
    if lib is None:
        return None
    # vocab words in id order, newline-separated
    id2word = sorted(tokenizer.vocab.items(), key=lambda kv: kv[1])
    blob = "\n".join(w for w, _ in id2word).encode("utf-8")
    ctx = lib.tokenizer_create(blob, len(blob), tokenizer.pad_token_id,
                               tokenizer.unk_token_id,
                               tokenizer.cls_token_id,
                               tokenizer.sep_token_id)
    try:
        joined = "\x1e".join(t.replace("\x1e", " ") for t in texts)
        payload = joined.encode("utf-8")
        n = len(texts)
        ids = np.empty((n, max_length), np.int32)
        attn = np.empty((n, max_length), np.uint8)
        lib.tokenizer_encode_batch(
            ctx, payload, len(payload), n, max_length,
            ids.ctypes.data_as(ctypes.c_void_p),
            attn.ctypes.data_as(ctypes.c_void_p))
        return ids, attn
    finally:
        lib.tokenizer_destroy(ctx)
