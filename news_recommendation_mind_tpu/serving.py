"""Online serving API: trained experiment → low-latency scorer.

Productionises the reference's fast-eval protocol (reference
utils/Manager.py:473-541, models/TwoTowerBaseModel.py:78-84) as a
standalone component: the news table is encoded once at load, candidate
and history representations come from table lookups, and only the user
encoder runs per request — jitted once per candidate-count bucket so
every request hits a compiled executable with static shapes.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .data.loader import NewsLoader, _bucket_for
from .evaluation.engine import encode_all_news
from .experiment import build_data, build_model, build_train_loader
from .train import create_train_state, load_checkpoint, optimizer_for
from .utils.logging import get_logger

logger = get_logger("serving")


class Recommender:
    """Loads the best checkpoint of an experiment and serves rankings."""

    def __init__(self, cfg: Config, split: str = "dev",
                 buckets: Sequence[int] = (8, 32, 128, 512),
                 checkpoint_step: Optional[int] = None):
        self.cfg = cfg
        data = build_data(cfg, splits=("train", split))
        self.news = data.news[split]
        self.nid2idx = self.news.nid2idx
        self.model = build_model(cfg, data.vocab_size, data.user_num)
        self.hidden_dim = getattr(self.model, "hidden_dim", cfg.hidden_dim)
        self.his_size = cfg.his_size
        self.buckets = sorted(buckets)

        from .data.loader import ensure_tokens
        sample_loader = build_train_loader(cfg, data)
        sample = ensure_tokens(next(iter(sample_loader)), sample_loader)
        params = self.model.init(jax.random.PRNGKey(cfg.seed), sample)
        template = create_train_state(
            params, optimizer_for(cfg))
        try:
            state = load_checkpoint(cfg.ckpt_dir(), cfg.scale, template,
                                    step=checkpoint_step,
                                    best=checkpoint_step is None)
            self.params = state.params
            logger.info("serving from checkpoint step %d", int(state.step))
        except FileNotFoundError:
            self.params = params
            logger.warning("no checkpoint found; serving fresh parameters")

        news_loader = NewsLoader(self.news,
                                 batch_size=cfg.batch_size_news,
                                 signal_length=cfg.signal_length)
        self.table = jnp.asarray(encode_all_news(
            self.model, self.params, news_loader, self.hidden_dim))
        self.idx2nid = {v: k for k, v in self.nid2idx.items()}
        self._score_fns: Dict[int, callable] = {}
        self._retrieve_fns: Dict[int, callable] = {}

    def _score_fn(self, width: int):
        if width not in self._score_fns:
            model = self.model

            def fn(params, table, cdd_idx, his_idx, his_mask, user_id):
                cdd = jnp.take(table, cdd_idx, axis=0)[None]     # [1,W,H]
                his = jnp.take(table, his_idx, axis=0)[None]     # [1,N,H]
                user = model.apply(
                    params, his, his_mask[None], user_id,
                    method=type(model).encode_user_from_reprs)
                d = jnp.asarray(cdd.shape[-1], cdd.dtype)
                return jax.nn.sigmoid(
                    jnp.einsum("bwh,buh->bw", cdd, user) / jnp.sqrt(d))[0]

            self._score_fns[width] = jax.jit(fn)
        return self._score_fns[width]

    def score(self, history_nids: Sequence[str],
              candidate_nids: Sequence[str],
              user_id: Optional[int] = None) -> np.ndarray:
        """Click probabilities for candidates given a click history."""
        his = np.zeros(self.his_size, np.int32)
        his_mask = np.zeros(self.his_size, np.float32)
        kept = [self.nid2idx.get(n, 0) for n in history_nids][:self.his_size]
        his[:len(kept)] = kept
        his_mask[:max(len(kept), 1)] = 1.0

        width = _bucket_for(len(candidate_nids), self.buckets)
        cdd = np.zeros(width, np.int32)
        ids = [self.nid2idx.get(n, 0) for n in candidate_nids]
        cdd[:len(ids)] = ids
        uid = jnp.asarray([user_id or 0], jnp.int32)
        scores = self._score_fn(width)(
            self.params, self.table, jnp.asarray(cdd), jnp.asarray(his),
            jnp.asarray(his_mask), uid)
        return np.asarray(scores)[:len(candidate_nids)]

    def rank(self, history_nids: Sequence[str],
             candidate_nids: Sequence[str],
             user_id: Optional[int] = None,
             top_k: Optional[int] = None) -> List[Tuple[str, float]]:
        """Candidates sorted by click probability (descending)."""
        scores = self.score(history_nids, candidate_nids, user_id)
        order = np.argsort(-scores, kind="stable")
        ranked = [(candidate_nids[i], float(scores[i])) for i in order]
        return ranked[:top_k] if top_k else ranked

    def _retrieve_fn(self, k: int):
        # jitted per top-k width (k is static for lax.top_k)
        if k not in self._retrieve_fns:
            model = self.model

            def fn(params, table, his_idx, his_mask, user_id):
                his = jnp.take(table, his_idx, axis=0)[None]   # [1,N,H]
                user = model.apply(
                    params, his, his_mask[None], user_id,
                    method=type(model).encode_user_from_reprs)  # [1,1,H]
                d = jnp.asarray(table.shape[-1], table.dtype)
                scores = jax.nn.sigmoid(
                    jnp.einsum("nh,buh->bn", table, user)[0] / jnp.sqrt(d))
                scores = scores.at[0].set(-jnp.inf)  # row 0 = pad article
                return jax.lax.top_k(scores, k)

            self._retrieve_fns[k] = jax.jit(fn)
        return self._retrieve_fns[k]

    def retrieve(self, history_nids: Sequence[str], k: int = 10,
                 user_id: Optional[int] = None,
                 exclude_history: bool = True) -> List[Tuple[str, float]]:
        """Candidate generation: top-k articles from the WHOLE corpus.

        Dense retrieval over the encoded-news table — one [1,H]x[H,news]
        matmul on the MXU plus lax.top_k; the TPU-native realisation of
        the recall capability the reference declares but never implements
        (reference utils/Manager.py:52, 117-119). Ranking is identical to
        calling ``rank`` with every article as a candidate (same scaled
        dot product + sigmoid).
        """
        his = np.zeros(self.his_size, np.int32)
        his_mask = np.zeros(self.his_size, np.float32)
        kept = [self.nid2idx.get(n, 0) for n in history_nids][:self.his_size]
        his[:len(kept)] = kept
        his_mask[:max(len(kept), 1)] = 1.0
        uid = jnp.asarray([user_id or 0], jnp.int32)
        # exclusion covers the FULL click history, not just the his_size
        # items the user encoder consumes
        skip = (set(self.nid2idx.get(n, 0) for n in history_nids) - {0}
                if exclude_history else set())
        n_real = self.table.shape[0] - 1
        # over-fetch a STATIC width per k (one jit each, like the score
        # buckets); fall back to an exact width only when a history longer
        # than his_size exhausts the margin
        for fetch in (min(k + (self.his_size if exclude_history else 0),
                          n_real),
                      min(k + len(skip), n_real)):
            vals, idx = self._retrieve_fn(fetch)(
                self.params, self.table, jnp.asarray(his),
                jnp.asarray(his_mask), uid)
            vals, idx = np.asarray(vals), np.asarray(idx)
            out = [(self.idx2nid.get(int(i), str(int(i))), float(v))
                   for i, v in zip(idx, vals) if int(i) not in skip]
            if len(out) >= k or fetch >= n_real:
                break
        return out[:k]
