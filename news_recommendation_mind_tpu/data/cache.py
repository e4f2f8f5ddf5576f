"""Offline tokenize+cache pipeline for MIND news and behaviors.

TPU-native rebuild of the reference's dataset initialisation
(reference utils/MIND.py:15-274 and utils/Manager.py:1029-1202):

- News: one pass over ``news.tsv`` joining title+abstract+subcategory
  (reference utils/MIND.py:132), tokenized to ``max_token_length`` and
  stored as dense int32/uint8 matrices with **row 0 = all-pad article** so
  news index 0 is padding (reference utils/MIND.py:125-127). Saved as a
  memory-mappable ``.npz`` instead of a pickle.
- Behaviors: three mode branches matching the reference —
  *train* = one record per positive click with the impression's negative
  pool (reference utils/MIND.py:168-207); *dev* = labeled impressions
  chunked to ``impr_size`` candidates (utils/MIND.py:210-241); *test* =
  unlabeled chunks (utils/MIND.py:244-274). Ragged candidate/negative sets
  are stored as flat arrays + offsets (host-side; device batches are
  always fixed-shape).
- Single-writer build: process 0 builds, other processes wait on a marker
  file — the reference's rank-0 + dist.barrier pattern
  (reference utils/MIND.py:46-67, 83-98) without a collective.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# single-writer coordination
# --------------------------------------------------------------------------

def single_writer_build(target_dir: str, build_fn, process_index: int = 0,
                        timeout_s: float = 600.0) -> None:
    """Run build_fn() on process 0 only; other processes wait for the marker."""
    marker = os.path.join(target_dir, ".complete")
    if os.path.exists(marker):
        return
    if process_index == 0:
        os.makedirs(target_dir, exist_ok=True)
        build_fn()
        with open(marker, "w") as f:
            f.write(str(time.time()))
    else:
        deadline = time.time() + timeout_s
        while not os.path.exists(marker):
            if time.time() > deadline:
                raise TimeoutError(f"cache build marker never appeared: {marker}")
            time.sleep(0.5)


# --------------------------------------------------------------------------
# news cache
# --------------------------------------------------------------------------

@dataclasses.dataclass
class NewsCache:
    """Tokenized news table. Row 0 is the all-pad article."""
    tokens: np.ndarray       # [n_news+1, max_token_length] int32
    attn_mask: np.ndarray    # [n_news+1, max_token_length] uint8
    nid2idx: Dict[str, int]  # news id -> row (1-based; 0 = pad)
    sep_token_id: int

    @property
    def news_num(self) -> int:
        return self.tokens.shape[0] - 1

    def truncated(self, signal_length: int) -> Tuple[np.ndarray, np.ndarray]:
        """Truncate to signal_length, forcing the last kept token to [SEP].

        Mirrors the reference's load-time truncation
        (reference utils/MIND.py:103-108): any article longer than
        signal_length gets its final kept position overwritten with [SEP];
        shorter articles are untouched.
        """
        toks = self.tokens[:, :signal_length].copy()
        attn = self.attn_mask[:, :signal_length].copy()
        full = self.attn_mask[:, signal_length:].any(axis=1) if \
            self.attn_mask.shape[1] > signal_length else \
            np.zeros(len(toks), dtype=bool)
        toks[full, signal_length - 1] = self.sep_token_id
        return toks, attn


def parse_news_tsv(path: str) -> Tuple[List[str], List[str]]:
    """Parse news.tsv → (nids, article texts = title + abstract + subcat)."""
    nids, texts = [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 5:
                continue
            nid, _cat, subcat, title, abstract = parts[:5]
            nids.append(nid)
            texts.append(" ".join([title, abstract, subcat]))
    return nids, texts


def build_news_cache(news_tsv: str, cache_dir: str, tokenizer,
                     max_token_length: int = 512,
                     process_index: int = 0) -> NewsCache:
    """Tokenize news once and cache (reference utils/MIND.py:111-151)."""
    npz_path = os.path.join(cache_dir, "news.npz")
    map_path = os.path.join(cache_dir, "nid2idx.json")

    def _build():
        nids, texts = parse_news_tsv(news_tsv)
        n = len(nids)
        toks = np.zeros((n + 1, max_token_length), dtype=np.int32)
        attn = np.zeros((n + 1, max_token_length), dtype=np.uint8)
        encoded = None
        from .tokenizer import WordTokenizer
        from .wordpiece import WordPieceTokenizer
        if isinstance(tokenizer, WordTokenizer):
            # native (C++/OpenMP) batch tokenization for the one-time
            # cache build; Python fallback below is semantically identical
            try:
                from .native_tokenizer import encode_corpus
                encoded = encode_corpus(tokenizer, texts, max_token_length)
            except Exception:
                encoded = None
        elif isinstance(tokenizer, WordPieceTokenizer):
            try:
                from .native_wordpiece import encode_corpus
                encoded = encode_corpus(tokenizer, texts, max_token_length)
            except Exception:
                encoded = None
        if encoded is not None:
            toks[1:], attn[1:] = encoded
        else:
            for i, text in enumerate(texts):
                toks[i + 1], attn[i + 1] = tokenizer.encode(
                    text, max_token_length)
        np.savez(npz_path, tokens=toks, attn_mask=attn,
                 sep_token_id=np.int32(tokenizer.sep_token_id))
        with open(map_path, "w", encoding="utf-8") as f:
            json.dump({nid: i + 1 for i, nid in enumerate(nids)}, f)

    single_writer_build(cache_dir, _build, process_index)
    data = np.load(npz_path)
    with open(map_path, encoding="utf-8") as f:
        nid2idx = json.load(f)
    return NewsCache(tokens=data["tokens"], attn_mask=data["attn_mask"],
                     nid2idx=nid2idx,
                     sep_token_id=int(data["sep_token_id"]))


# --------------------------------------------------------------------------
# behaviors
# --------------------------------------------------------------------------

@dataclasses.dataclass
class Behaviors:
    """Parsed behaviors for one split.

    train mode (one record per positive click):
      pos[i], impr_idx[i], uindex[i], his_flat/his_offsets (ragged history,
      most-recent-last as in the file), neg_flat/neg_offsets (per-record
      negative pool — shared across records of the same impression).
    dev/test mode (impression chunks of <= impr_size candidates):
      impr_idx[j], uindex[j], his_* ragged per chunk, cdd_flat/cdd_offsets,
      labels_flat (dev only).
    """
    mode: str
    impr_idx: np.ndarray
    uindex: np.ndarray
    his_flat: np.ndarray
    his_offsets: np.ndarray
    pos: Optional[np.ndarray] = None
    neg_flat: Optional[np.ndarray] = None
    neg_offsets: Optional[np.ndarray] = None
    cdd_flat: Optional[np.ndarray] = None
    cdd_offsets: Optional[np.ndarray] = None
    labels_flat: Optional[np.ndarray] = None
    uid2idx: Optional[Dict[str, int]] = None

    def __len__(self) -> int:
        return len(self.impr_idx)

    def history(self, i: int) -> np.ndarray:
        return self.his_flat[self.his_offsets[i]:self.his_offsets[i + 1]]

    def negatives(self, i: int) -> np.ndarray:
        return self.neg_flat[self.neg_offsets[i]:self.neg_offsets[i + 1]]

    def candidates(self, j: int) -> np.ndarray:
        return self.cdd_flat[self.cdd_offsets[j]:self.cdd_offsets[j + 1]]

    def labels(self, j: int) -> np.ndarray:
        return self.labels_flat[self.cdd_offsets[j]:self.cdd_offsets[j + 1]]


def _ragged(lists: List[np.ndarray], dtype=np.int32):
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in lists], out=offsets[1:])
    flat = (np.concatenate(lists).astype(dtype) if lists and offsets[-1] > 0
            else np.zeros(0, dtype=dtype))
    return flat, offsets


def build_behaviors(behaviors_tsv: str, nid2idx: Dict[str, int], mode: str,
                    impr_size: int = 2000,
                    uid2idx: Optional[Dict[str, int]] = None,
                    cache_dir: Optional[str] = None,
                    process_index: int = 0) -> Behaviors:
    """Parse behaviors.tsv into the mode-specific structure.

    Unknown user ids map to 0 (the pad/cold-user row, reference
    utils/MIND.py:195-198's uid2index fallback); unknown news ids map to 0.
    """
    if cache_dir is not None:
        pkl = os.path.join(cache_dir, f"behaviors_{mode}_{impr_size}.npz")
        # the marker must be keyed by impr_size too: a cache built at one
        # impr_size must not satisfy a request for another (the npz file
        # name is per-impr_size, reference utils/MIND.py:37-45)
        marker = os.path.join(cache_dir,
                              f".complete_{mode}_{impr_size}")
        if not os.path.exists(marker):
            def _build():
                b = _parse_behaviors(behaviors_tsv, nid2idx, mode, impr_size,
                                     uid2idx)
                _save_behaviors(pkl, b)
            if process_index == 0:
                os.makedirs(cache_dir, exist_ok=True)
                _build()
                with open(marker, "w") as f:
                    f.write("1")
            else:
                deadline = time.time() + 600
                while not os.path.exists(marker):
                    if time.time() > deadline:
                        raise TimeoutError(marker)
                    time.sleep(0.5)
        return _load_behaviors(pkl, mode)
    return _parse_behaviors(behaviors_tsv, nid2idx, mode, impr_size, uid2idx)


def _parse_behaviors(path: str, nid2idx: Dict[str, int], mode: str,
                     impr_size: int,
                     uid2idx: Optional[Dict[str, int]]) -> Behaviors:
    build_uid = uid2idx is None
    uid2idx = dict(uid2idx) if uid2idx else {}

    impr_idx_l: List[int] = []
    uindex_l: List[int] = []
    his_l: List[np.ndarray] = []
    pos_l: List[int] = []
    neg_l: List[np.ndarray] = []
    cdd_l: List[np.ndarray] = []
    lab_l: List[np.ndarray] = []

    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 5:
                continue
            impr_id_s, uid, _time, history_s, imprs_s = parts[:5]
            impr_id = int(impr_id_s)
            if build_uid and uid not in uid2idx:
                uid2idx[uid] = len(uid2idx) + 1  # 0 reserved for pad/unknown
            u = uid2idx.get(uid, 0)
            history = np.array(
                [nid2idx.get(n, 0) for n in history_s.split()] if history_s
                else [], dtype=np.int32)

            tokens = imprs_s.split()
            if mode == "train":
                cands, labels = [], []
                for t in tokens:
                    nid, lab = t.rsplit("-", 1)
                    cands.append(nid2idx.get(nid, 0))
                    labels.append(int(lab))
                cands_a = np.array(cands, dtype=np.int32)
                labels_a = np.array(labels, dtype=np.int8)
                negs = cands_a[labels_a == 0]
                for p in cands_a[labels_a == 1]:
                    impr_idx_l.append(impr_id)
                    uindex_l.append(u)
                    his_l.append(history)
                    pos_l.append(int(p))
                    neg_l.append(negs)
            else:
                if mode == "dev":
                    cands, labels = [], []
                    for t in tokens:
                        nid, lab = t.rsplit("-", 1)
                        cands.append(nid2idx.get(nid, 0))
                        labels.append(int(lab))
                    labels_a = np.array(labels, dtype=np.int8)
                else:
                    cands = [nid2idx.get(n, 0) for n in tokens]
                    labels_a = None
                cands_a = np.array(cands, dtype=np.int32)
                # chunk to impr_size (reference utils/MIND.py:225-226)
                for s in range(0, len(cands_a), impr_size):
                    impr_idx_l.append(impr_id)
                    uindex_l.append(u)
                    his_l.append(history)
                    cdd_l.append(cands_a[s:s + impr_size])
                    if labels_a is not None:
                        lab_l.append(labels_a[s:s + impr_size])

    his_flat, his_offsets = _ragged(his_l)
    b = Behaviors(
        mode=mode,
        impr_idx=np.array(impr_idx_l, dtype=np.int64),
        uindex=np.array(uindex_l, dtype=np.int32),
        his_flat=his_flat, his_offsets=his_offsets,
        uid2idx=uid2idx,
    )
    if mode == "train":
        b.pos = np.array(pos_l, dtype=np.int32)
        b.neg_flat, b.neg_offsets = _ragged(neg_l)
    else:
        b.cdd_flat, b.cdd_offsets = _ragged(cdd_l)
        if lab_l:
            b.labels_flat, _ = _ragged(lab_l, dtype=np.int8)
    return b


_ARR_FIELDS = ["impr_idx", "uindex", "his_flat", "his_offsets", "pos",
               "neg_flat", "neg_offsets", "cdd_flat", "cdd_offsets",
               "labels_flat"]


def _save_behaviors(path: str, b: Behaviors) -> None:
    arrays = {k: getattr(b, k) for k in _ARR_FIELDS if getattr(b, k) is not None}
    arrays["uid2idx_json"] = np.frombuffer(
        json.dumps(b.uid2idx or {}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def _load_behaviors(path: str, mode: str) -> Behaviors:
    data = np.load(path)
    kw = {k: data[k] for k in _ARR_FIELDS if k in data.files}
    uid2idx = json.loads(bytes(data["uid2idx_json"]).decode())
    return Behaviors(mode=mode, uid2idx=uid2idx, **kw)
