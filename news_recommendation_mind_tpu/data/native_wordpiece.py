"""ctypes bridge to the native (C++/OpenMP) WordPiece tokenizer.

Fast path for the one-time PLM news.tsv tokenization pass (the HF-Rust
replacement, reference utils/MIND.py:90-91): semantics identical to
data/wordpiece.py. Exactness scheme: ASCII is classified inline in C++;
every non-ASCII codepoint appearing in the corpus (or in a lower+NFD
replacement) is classified HERE with unicodedata as the oracle and shipped
to C++ as a table — so the native path cannot drift from the Python
pipeline on the inputs it processes. Falls back to the Python tokenizer
when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Sequence, Tuple

import numpy as np

from .wordpiece import (WordPieceTokenizer, _is_cjk, _is_control,
                        _is_punctuation, _is_whitespace, _strip_accents)
from ..utils.logging import get_logger

logger = get_logger("native_wordpiece")

_LIB = None
_LIB_FAILED = False

_WS, _CTRL, _CJK, _PUNCT, _OTHER = 1, 2, 3, 4, 0


def _build_library() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(here, "native", "wordpiece.cpp")
    if not os.path.exists(src):
        return None
    cache_dir = os.path.join(tempfile.gettempdir(), "nrm_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    lib = os.path.join(cache_dir, "libwordpiece.so")
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           src, "-o", lib + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(lib + ".tmp", lib)
        return lib
    except Exception as e:
        logger.warning("native wordpiece build failed (%s)", e)
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
    lib.wordpiece_create.restype = ptr
    lib.wordpiece_create.argtypes = [ctypes.c_char_p, i64, ctypes.c_char_p,
                                     i64, i32, i32, i32, i32]
    lib.wordpiece_destroy.argtypes = [ptr]
    lib.wordpiece_encode_batch.argtypes = [
        ptr, ctypes.c_char_p, i64, i64, i64, ptr, ptr]
    _LIB = lib
    return _LIB


def _classify(ch: str) -> int:
    if _is_whitespace(ch):
        return _WS
    if _is_control(ch):
        return _CTRL
    if _is_cjk(ord(ch)):
        return _CJK
    if _is_punctuation(ch):
        return _PUNCT
    return _OTHER


def _char_table(texts: Sequence[str]) -> bytes:
    """Per-codepoint class + lower/NFD-strip replacement for every
    non-ASCII char in the corpus (plus chars their replacements produce)."""
    charset = set()
    for t in texts:
        charset.update(t)
    charset = {c for c in charset if ord(c) >= 128}
    repls = {c: _strip_accents(c.lower()) for c in charset}
    extra = {ch for r in repls.values() for ch in r if ord(ch) >= 128}
    lines = []
    for c in sorted(charset | extra):
        r = repls.get(c, _strip_accents(c.lower()))
        lines.append(f"{ord(c)}\t{_classify(c)}\t{r}")
    return "\n".join(lines).encode("utf-8")


def encode_corpus(tokenizer: WordPieceTokenizer, texts: Sequence[str],
                  max_length: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Tokenize all texts natively → (ids [n, L] int32, attn [n, L] uint8).

    Returns None when the native library is unavailable (callers fall back
    to the per-article Python encode).
    """
    lib = get_library()
    if lib is None:
        return None
    id2tok = sorted(tokenizer.vocab.items(), key=lambda kv: kv[1])
    vocab_blob = "\n".join(t for t, _ in id2tok).encode("utf-8")
    chartab = _char_table(texts)
    ctx = lib.wordpiece_create(vocab_blob, len(vocab_blob), chartab,
                               len(chartab), tokenizer.pad_token_id,
                               tokenizer.unk_token_id,
                               tokenizer.cls_token_id,
                               tokenizer.sep_token_id)
    try:
        # \x1e is a C0 control char: the Python pipeline *removes* it, so
        # removal (not space-replacement) keeps the separator exact
        joined = "\x1e".join(t.replace("\x1e", "") for t in texts)
        payload = joined.encode("utf-8")
        n = len(texts)
        ids = np.empty((n, max_length), np.int32)
        attn = np.empty((n, max_length), np.uint8)
        lib.wordpiece_encode_batch(
            ctx, payload, len(payload), n, max_length,
            ids.ctypes.data_as(ctypes.c_void_p),
            attn.ctypes.data_as(ctypes.c_void_p))
        return ids, attn
    finally:
        lib.wordpiece_destroy(ctx)
