"""GloVe vector loading for the pretrained word-embedding path.

The reference's GloVe option rides its (broken) Random_Embedding
(reference models/Embeddings/Random.py:11 calls an undefined method); here
the path is file-based and offline: a standard `glove.*.txt` file (word
followed by floats per line) is aligned to the cache's WordTokenizer
vocabulary into a [vocab, dim] init matrix. Missing words keep a small
random init; special tokens start at zero.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .tokenizer import WordTokenizer


def find_glove_file(search_dirs) -> Optional[str]:
    for d in search_dirs:
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if name.startswith("glove") and name.endswith(".txt"):
                return os.path.join(d, name)
    return None


def load_glove_matrix(glove_path: str, tokenizer: WordTokenizer,
                      embedding_dim: int, seed: int = 0) -> np.ndarray:
    """Build a [vocab_size, embedding_dim] matrix aligned to the vocab."""
    rng = np.random.default_rng(seed)
    mat = rng.normal(0.0, 0.02,
                     (tokenizer.vocab_size, embedding_dim)).astype(np.float32)
    for tok_id in (tokenizer.pad_token_id,):
        mat[tok_id] = 0.0
    hits = 0
    with open(glove_path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            word = parts[0]
            idx = tokenizer.vocab.get(word)
            if idx is None:
                continue
            vec = np.asarray(parts[1:], dtype=np.float32)
            if len(vec) < embedding_dim:
                continue
            mat[idx] = vec[:embedding_dim]
            hits += 1
    if hits == 0:
        raise ValueError(f"no vocabulary overlap with {glove_path}")
    return mat
