"""Host-side streaming batchers with fixed shapes and device prefetch.

Replaces the reference's torch DataLoader + worker __getitem__ pipeline
(reference utils/MIND.py:278-553, utils/Manager.py:183-286) with pure-numpy
batch assembly designed for XLA: every batch a loader emits has a *static*
shape, so each loader compiles exactly one executable.

- ``TrainLoader``  — per-step in-impression negative sampling
  (reference utils/utils.py:83-98 `newsample`), history truncate/pad to
  ``his_size``, candidate position shuffle, epoch shuffling with per-epoch
  reseed (the reference's DistributedSampler.set_epoch,
  utils/Manager.py:630-631), and sharding across processes.
- ``NewsLoader``   — all-news sweep for fast-eval encoding
  (reference utils/MIND.py:453-490 MIND_news).
- ``EvalLoader``   — impression chunks padded to a fixed candidate width
  with masks (TPU-friendly replacement for the reference's bs=1 dynamic
  candidate counts), contiguous per-process partition like
  Partition_Sampler (reference utils/utils.py:267-283).
- ``HistoryLoader``— user-history sweep for the `encode` benchmark mode
  (reference utils/MIND.py:494-553 MIND_history).
- ``prefetch_to_device`` — double-buffered host→device transfer.
"""
from __future__ import annotations

import math
from typing import Dict, Iterator, List, Sequence

import numpy as np

from .cache import Behaviors, NewsCache


Batch = Dict[str, np.ndarray]


def _pad_histories(behaviors: Behaviors, his_size: int, descend: bool,
                   chunk: int = 1 << 20):
    """Vectorized history truncate/pad: returns ids [n, his_size] int32 and
    mask [n, his_size] float32 (empty history gets mask[0]=1, matching
    reference utils/MIND.py:333-336).

    Ragged→dense numpy pass with no per-row Python loop, processed in
    row chunks: a single pass at MINDlarge-rehearsal scale (9.2M
    per-positive train rows × his 50) materialised ~15 GB of int64
    index/validity temporaries and took 246 s; chunking bounds the
    temporaries to ~0.5 GB and int32 column math halves their width,
    measured 37 s at the same scale (6.7x). Each row i takes its first min(len, his_size)
    history ids (reversed when ``descend``, matching the reference's
    truncate-then-reverse order)."""
    n = len(behaviors)
    offs = behaviors.his_offsets
    flat = behaviors.his_flat
    ids = np.zeros((n, his_size), dtype=np.int32)
    mask = np.zeros((n, his_size), dtype=np.float32)
    col = np.arange(his_size, dtype=np.int32)[None, :]         # [1, his]
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        lens = np.minimum(np.diff(offs[s:e + 1]),
                          his_size).astype(np.int32)           # [m]
        valid = col < lens[:, None]                            # [m, his]
        base = offs[s:e, None].astype(np.int64)
        if descend:
            src = base + (lens[:, None] - 1 - col)
        else:
            src = base + col
        src = np.where(valid, src, 0)
        if flat.size:
            np.copyto(ids[s:e], np.where(valid, flat[src], 0),
                      casting="unsafe")
        mask[s:e] = col < np.maximum(lens, 1)[:, None]
    return ids, mask


class TrainLoader:
    """Iterable over fixed-shape training batches.

    Batch keys (the L3<->L2 contract, reference utils/MIND.py:352-363):
      user_id [bs], cdd_id [bs,cdd], his_id [bs,his],
      cdd_token/cdd_attn [bs,cdd,sl], his_token/his_attn [bs,his,sl],
      cdd_mask [bs,cdd], his_mask [bs,his], label [bs].
    """

    def __init__(self, news: NewsCache, behaviors: Behaviors, *,
                 batch_size: int, npratio: int, his_size: int,
                 signal_length: int, shuffle_pos: bool = False,
                 descend_history: bool = False, seed: int = 42,
                 num_shards: int = 1, shard_index: int = 0,
                 drop_last: bool = True, backend: str = "auto",
                 emit_tokens: bool = True, dedup: bool = False):
        assert behaviors.mode == "train"
        # emit_tokens=False: device-gather mode — batches carry ids only;
        # the token cache lives in HBM and the train step gathers there
        # (60x less host->device traffic; see train/step.py news_table)
        self.emit_tokens = emit_tokens
        # dedup: additionally emit the batch's unique news ids plus
        # per-slot indices so the device encodes each distinct article
        # once (models/two_tower.py forward_from_unique); ids-only mode
        self.dedup = dedup and not emit_tokens
        self.news_tokens, self.news_attn = news.truncated(signal_length)
        self.news_attn = self.news_attn.astype(np.float32)
        self.b = behaviors
        self.batch_size = batch_size
        self.npratio = npratio
        self.cdd_size = npratio + 1
        self.shuffle_pos = shuffle_pos
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.drop_last = drop_last
        self.his_ids, self.his_mask = _pad_histories(
            behaviors, his_size, descend_history)
        self.n = len(behaviors)
        self.epoch = 0
        # native (C++/OpenMP) assembly — ~10x the numpy path's throughput;
        # see data/native_batcher.py
        self._native = None
        if backend in ("auto", "native"):
            try:
                from .native_batcher import NativeBatcher
                self._native = NativeBatcher(
                    behaviors, self.his_ids, self.his_mask,
                    self.news_tokens, self.news_attn,
                    npratio=npratio, seed=seed)
            except Exception:
                if backend == "native":
                    raise
        self.backend = "native" if self._native is not None else "numpy"
        if self.dedup:
            # static unique-pool width: a batch can't contain more
            # distinct news than slots or than the corpus; round up so
            # the array divides typical mesh data-axis sizes
            cap = min(self.news_tokens.shape[0],
                      batch_size * (self.cdd_size + his_size))
            self.u_pad = -(-cap // 256) * 256
            # bucketed padding: batches usually touch far fewer distinct
            # articles than the cap (popularity skew), and the news tower
            # pays for every padded row — quantise to at most 8 bucket
            # widths so XLA compiles a handful of step variants instead
            # of encoding up to ~45% padding each step. Multi-process
            # runs must agree on global array shapes every step, and the
            # bucket choice depends on each process's local batch, so
            # sharded loaders pin the width to the cap.
            if self.num_shards > 1:
                self.u_quantum = self.u_pad
            else:
                self.u_quantum = max(256, -(-self.u_pad // 8 // 256) * 256)

    def _dedupify(self, batch: Batch) -> Batch:
        """ids-only batch → + uniq_id [U_pad], cdd_pos/his_pos (see
        forward_from_unique). Padding id 0 maps extra rows to the pad
        article; duplicate pad rows only add masked work.

        Rides the native batcher's O(n) mark-array dedup when available
        (dedup_batch in native/batcher.cpp; first-occurrence order) and
        falls back to per-batch np.unique (sorted order). The orders
        differ but both satisfy the contract uniq_id[cdd_pos] == cdd_id
        (tests/test_dedup.py; tests/test_native_batcher.py pins the
        native path against the numpy one)."""
        cdd, his = batch["cdd_id"], batch["his_id"]
        if self._native is not None:
            res = self._native.dedup_batch(cdd, his, self.u_pad,
                                           self.u_quantum)
            if res is not None:
                out = dict(batch)
                out["uniq_id"], out["cdd_pos"], out["his_pos"] = res
                return out
        ids = np.concatenate([cdd.ravel(), his.ravel()])
        uniq, inv = np.unique(ids, return_inverse=True)
        if len(uniq) > self.u_pad:      # can't happen by construction
            return batch
        width = min(self.u_pad,
                    -(-len(uniq) // self.u_quantum) * self.u_quantum)
        uniq_pad = np.zeros(width, np.int32)
        uniq_pad[:len(uniq)] = uniq
        out = dict(batch)
        out["uniq_id"] = uniq_pad
        out["cdd_pos"] = inv[:cdd.size].reshape(cdd.shape).astype(np.int32)
        out["his_pos"] = inv[cdd.size:].reshape(his.shape).astype(np.int32)
        return out

    def __len__(self) -> int:
        per_shard = self.n // self.num_shards if self.drop_last else \
            math.ceil(self.n / self.num_shards)
        return per_shard // self.batch_size if self.drop_last else \
            math.ceil(per_shard / self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _sample_negatives(self, idx: np.ndarray,
                          rng: np.random.Generator) -> tuple:
        """newsample semantics: without replacement, zero-pad short pools
        (reference utils/utils.py:83-98). Returns (neg_ids [bs,npratio],
        neg_num [bs])."""
        bs = len(idx)
        neg = np.zeros((bs, self.npratio), dtype=np.int32)
        neg_num = np.zeros(bs, dtype=np.int32)
        offs = self.b.neg_offsets
        flat = self.b.neg_flat
        for i, s in enumerate(idx):
            pool = flat[offs[s]:offs[s + 1]]
            k = len(pool)
            if k <= self.npratio:
                neg[i, :k] = pool
                neg_num[i] = k
            else:
                pick = rng.choice(k, size=self.npratio, replace=False)
                neg[i] = pool[pick]
                neg_num[i] = self.npratio
        return neg, neg_num

    def __iter__(self) -> Iterator[Batch]:
        rng = np.random.default_rng(self.seed + 1000 * self.epoch)
        order = rng.permutation(self.n)
        order = order[self.shard_index::self.num_shards]
        nb = len(order) // self.batch_size if self.drop_last else \
            math.ceil(len(order) / self.batch_size)
        for bi in range(nb):
            idx = order[bi * self.batch_size:(bi + 1) * self.batch_size]
            if self._native is not None:
                batch = self._native.make_batch(idx, self.epoch,
                                                self.shuffle_pos,
                                                self.emit_tokens)
            else:
                batch = self._make_batch(idx, rng)
                if not self.emit_tokens:
                    for k in ("cdd_token", "cdd_attn", "his_token",
                              "his_attn"):
                        del batch[k]
            yield self._dedupify(batch) if self.dedup else batch

    def _make_batch(self, idx: np.ndarray, rng: np.random.Generator) -> Batch:
        bs = len(idx)
        neg, neg_num = self._sample_negatives(idx, rng)
        cdd_ids = np.concatenate(
            [self.b.pos[idx, None], neg], axis=1)          # [bs, cdd]
        label = np.zeros(bs, dtype=np.int32)               # positive at col 0
        cdd_mask = (np.arange(self.cdd_size)[None, :]
                    <= neg_num[:, None]).astype(np.float32)
        if self.shuffle_pos:
            # per-row candidate permutation; label follows the positive
            perm = np.argsort(rng.random((bs, self.cdd_size)), axis=1)
            rows = np.arange(bs)[:, None]
            cdd_ids = cdd_ids[rows, perm]
            cdd_mask = cdd_mask[rows, perm]
            label = np.argmax(perm == 0, axis=1).astype(np.int32)
        his_ids = self.his_ids[idx]
        return {
            "user_id": self.b.uindex[idx],
            "cdd_id": cdd_ids,
            "his_id": his_ids,
            "cdd_token": self.news_tokens[cdd_ids],
            "cdd_attn": self.news_attn[cdd_ids],
            "his_token": self.news_tokens[his_ids],
            "his_attn": self.news_attn[his_ids],
            "cdd_mask": cdd_mask,
            "his_mask": self.his_mask[idx],
            "label": label,
        }


class NewsLoader:
    """Fixed-shape sweep over the whole news table (row 0 included).

    Emits {news_id [bs], token [bs,sl], attn [bs,sl], valid [bs]}; the last
    batch is padded with row 0 and masked via `valid`.

    With num_shards > 1 each process sweeps only a contiguous row slice
    (the reference encodes the table once on rank 0 and shares it by
    file, utils/Manager.py:489-508; here every process encodes 1/P of
    the corpus and evaluation.engine.encode_all_news allgathers the
    slices — at MINDlarge-test scale this divides the 120k full-PLM
    passes per process by the process count).
    """

    def __init__(self, news: NewsCache, *, batch_size: int,
                 signal_length: int,
                 num_shards: int = 1, shard_index: int = 0):
        self.tokens, self.attn = news.truncated(signal_length)
        self.attn = self.attn.astype(np.float32)
        self.batch_size = batch_size
        self.n = self.tokens.shape[0]
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.rows_per_shard = math.ceil(self.n / num_shards)
        self.shard_start = min(shard_index * self.rows_per_shard, self.n)
        self.shard_stop = min(self.shard_start + self.rows_per_shard, self.n)

    def __len__(self) -> int:
        return math.ceil((self.shard_stop - self.shard_start)
                         / self.batch_size)

    def __iter__(self) -> Iterator[Batch]:
        for s in range(self.shard_start, self.shard_stop, self.batch_size):
            ids = np.arange(s, min(s + self.batch_size, self.shard_stop),
                            dtype=np.int32)
            pad = self.batch_size - len(ids)
            valid = np.concatenate([np.ones(len(ids), np.float32),
                                    np.zeros(pad, np.float32)])
            ids = np.concatenate([ids, np.zeros(pad, np.int32)])
            yield {"news_id": ids, "token": self.tokens[ids],
                   "attn": self.attn[ids], "valid": valid}


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class EvalLoader:
    """Impression-chunk batches padded to bucketed candidate widths.

    The reference evaluates bs=1 with dynamic candidate counts
    (reference utils/Manager.py:514-517); on TPU dynamic shapes force
    recompiles, so chunks are grouped into candidate-count *buckets* and
    padded — each (bucket, batch) shape compiles once. Chunks are
    partitioned contiguously across processes like Partition_Sampler
    (reference utils/utils.py:267-283).

    Emits {impr_index [bs], user_id [bs], cdd_id [bs,W], cdd_mask [bs,W],
    his_id [bs,his], his_token/his_attn, his_mask, label [bs,W] (dev),
    valid [bs]} per batch, where W is the bucket width.
    """

    def __init__(self, news: NewsCache, behaviors: Behaviors, *,
                 batch_size: int, his_size: int, signal_length: int,
                 buckets: Sequence[int] = (20, 50, 100, 200, 300, 500),
                 descend_history: bool = False,
                 num_shards: int = 1, shard_index: int = 0,
                 impr_size: int = 2000, include_cdd_tokens: bool = False):
        self.include_cdd_tokens = include_cdd_tokens
        assert behaviors.mode in ("dev", "test")
        self.news_tokens, self.news_attn = news.truncated(signal_length)
        self.news_attn = self.news_attn.astype(np.float32)
        self.b = behaviors
        self.batch_size = batch_size
        self.buckets = sorted(set(list(buckets) + [impr_size]))
        self.his_ids, self.his_mask = _pad_histories(
            behaviors, his_size, descend_history)
        # contiguous per-process partition
        n = len(behaviors)
        per = math.ceil(n / num_shards)
        self.chunk_ids = np.arange(shard_index * per,
                                   min((shard_index + 1) * per, n))
        # group chunks by bucket
        widths = np.diff(behaviors.cdd_offsets)
        self.groups: Dict[int, List[int]] = {}
        for j in self.chunk_ids:
            w = _bucket_for(int(widths[j]), self.buckets)
            self.groups.setdefault(w, []).append(int(j))

    def __len__(self) -> int:
        return sum(math.ceil(len(g) / self.batch_size)
                   for g in self.groups.values())

    def __iter__(self) -> Iterator[Batch]:
        has_labels = self.b.labels_flat is not None
        for width, chunk_list in sorted(self.groups.items()):
            for s in range(0, len(chunk_list), self.batch_size):
                js = chunk_list[s:s + self.batch_size]
                bs = self.batch_size
                cdd = np.zeros((bs, width), dtype=np.int32)
                cdd_mask = np.zeros((bs, width), dtype=np.float32)
                label = np.zeros((bs, width), dtype=np.int8)
                valid = np.zeros(bs, dtype=np.float32)
                impr = np.zeros(bs, dtype=np.int64)
                rows = np.zeros(bs, dtype=np.int64)
                for i, j in enumerate(js):
                    c = self.b.candidates(j)
                    cdd[i, :len(c)] = c
                    cdd_mask[i, :len(c)] = 1.0
                    if has_labels:
                        label[i, :len(c)] = self.b.labels(j)
                    valid[i] = 1.0
                    impr[i] = self.b.impr_idx[j]
                    rows[i] = j
                his_ids = self.his_ids[rows]
                batch = {
                    "row": rows,
                    "impr_index": impr,
                    "user_id": self.b.uindex[rows],
                    "cdd_id": cdd,
                    "cdd_mask": cdd_mask,
                    "his_id": his_ids,
                    "his_token": self.news_tokens[his_ids],
                    "his_attn": self.news_attn[his_ids],
                    "his_mask": self.his_mask[rows],
                    "label": label,
                    "valid": valid,
                }
                if self.include_cdd_tokens:  # slow-eval path scores from raw tokens
                    batch["cdd_token"] = self.news_tokens[cdd]
                    batch["cdd_attn"] = self.news_attn[cdd]
                yield batch


class HistoryLoader:
    """User-history sweep for the `encode` throughput mode
    (reference utils/MIND.py:494-553, utils/Manager.py:855-871)."""

    def __init__(self, news: NewsCache, behaviors: Behaviors, *,
                 batch_size: int, his_size: int, signal_length: int,
                 descend_history: bool = False):
        self.news_tokens, self.news_attn = news.truncated(signal_length)
        self.news_attn = self.news_attn.astype(np.float32)
        self.b = behaviors
        self.batch_size = batch_size
        self.his_ids, self.his_mask = _pad_histories(
            behaviors, his_size, descend_history)
        self.n = len(behaviors)

    def __len__(self) -> int:
        return self.n // self.batch_size

    def __iter__(self) -> Iterator[Batch]:
        for s in range(0, self.n - self.batch_size + 1, self.batch_size):
            rows = np.arange(s, s + self.batch_size)
            his_ids = self.his_ids[rows]
            yield {
                "user_id": self.b.uindex[rows],
                "his_id": his_ids,
                "his_token": self.news_tokens[his_ids],
                "his_attn": self.news_attn[his_ids],
                "his_mask": self.his_mask[rows],
            }


def ensure_tokens(batch: Batch, loader: "TrainLoader") -> Batch:
    """Host-side token gather for an ids-only batch (device-gather mode);
    used where a token-ful batch is needed once, e.g. model.init."""
    if "cdd_token" in batch:
        return batch
    batch = dict(batch)
    batch["cdd_token"] = loader.news_tokens[batch["cdd_id"]]
    batch["cdd_attn"] = loader.news_attn[batch["cdd_id"]]
    batch["his_token"] = loader.news_tokens[batch["his_id"]]
    batch["his_attn"] = loader.news_attn[batch["his_id"]]
    return batch


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Double-buffered host→device prefetch.

    Keeps `size` batches in flight ahead of the consumer; with a
    NamedSharding, batches are laid out across the mesh as they land
    (the jit'd step then consumes them without relayout). In
    multi-process mode each process feeds its local shard and the global
    array is assembled across hosts.
    """
    import collections
    import jax

    queue = collections.deque()
    multiprocess = jax.process_count() > 1

    def _put(batch):
        if sharding is not None:
            if multiprocess:
                return {k: jax.make_array_from_process_local_data(
                    sharding, v) for k, v in batch.items()}
            return {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return jax.device_put(batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(_put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(_put(next(it)))
        except StopIteration:
            pass
        yield out
