"""Shared CLI mode dispatch.

The counterpart of the reference entry scripts' main()
(reference twotower.py:7-59, plm.py:7-51, xformer.py:7-32): build data and
model from the parsed Config, then dispatch on mode —
train / dev (evaluate) / test (submission) / encode (user-encoding
throughput, reference utils/Manager.py:855-871).
"""
from __future__ import annotations

import time

import jax
import numpy as np

from ..config import Config
from ..evaluation.engine import evaluate, write_predictions
from ..experiment import (
    build_data, build_eval_loaders, build_history_loader, build_model,
    build_train_loader,
)
from ..train import Trainer, create_train_state, load_checkpoint, \
    make_optimizer
from ..utils.logging import get_logger, log_result

logger = get_logger("cli")


def _restored_state(cfg: Config, model, sample_batch):
    params = model.init(jax.random.PRNGKey(cfg.seed), sample_batch)
    opt = make_optimizer(cfg.lr, cfg.bert_lr)
    template = create_train_state(params, opt)
    if cfg.checkpoint:
        # -1 = newest checkpoint, matching the Trainer's resume semantics
        step = None if cfg.checkpoint < 0 else cfg.checkpoint
        return load_checkpoint(cfg.ckpt_dir(), cfg.scale, template,
                               step=step)
    try:
        return load_checkpoint(cfg.ckpt_dir(), cfg.scale, template,
                               best=True)
    except FileNotFoundError:
        logger.warning("no checkpoint found; using fresh parameters")
        return template


def run(cfg: Config, model_builder=build_model) -> dict:
    """Dispatch one experiment according to cfg.mode; returns metrics."""
    from ..config import apply_rng_impl
    apply_rng_impl(cfg)
    if cfg.anomaly:
        # the reference's --anomaly (torch autograd anomaly mode,
        # utils/Manager.py:710-712): fail fast on the op producing NaNs
        jax.config.update("jax_debug_nans", True)
    eval_split = "test" if cfg.mode == "test" else "dev"
    splits = ("train", eval_split)
    data = build_data(cfg, splits=splits)
    from ..experiment import load_pretrained_embedding
    from ..parallel.mesh import mesh_from_config
    mesh = mesh_from_config(cfg)
    pretrained = load_pretrained_embedding(cfg, data)
    model = model_builder(cfg, data.vocab_size, data.user_num,
                          pretrained_embedding=pretrained, mesh=mesh)
    # each process loads its contiguous shard; the mesh step consumes the
    # assembled global batch (reference DistributedSampler equivalent)
    train_loader = build_train_loader(
        cfg, data, num_shards=jax.process_count(),
        shard_index=jax.process_index())
    from ..data.loader import ensure_tokens
    sample_batch = ensure_tokens(next(iter(train_loader)), train_loader)

    if cfg.mode == "train":
        news_loader, eval_loader = build_eval_loaders(
            cfg, data, "dev", num_shards=jax.process_count(),
            shard_index=jax.process_index())
        trainer = Trainer(cfg, model, train_loader, news_loader,
                          eval_loader, mesh=mesh,
                          sample_batch=sample_batch)
        return trainer.train()

    state = _restored_state(cfg, model, sample_batch)
    hidden_dim = getattr(model, "hidden_dim", cfg.hidden_dim)
    if cfg.mode == "dev":
        news_loader, eval_loader = build_eval_loaders(
            cfg, data, "dev", num_shards=jax.process_count(),
            shard_index=jax.process_index())
        metrics = evaluate(model, state.params, eval_loader,
                           cfg.metric_list, news_loader=news_loader,
                           hidden_dim=hidden_dim, fast=cfg.fast,
                           save_table_path=cfg.news_repr_path("dev"))
        logger.info("dev metrics: %s", metrics)
        print(metrics)
        return metrics
    if cfg.mode == "test":
        news_loader, eval_loader = build_eval_loaders(
            cfg, data, "test", num_shards=jax.process_count(),
            shard_index=jax.process_index())
        path = write_predictions(model, state.params, eval_loader,
                                 cfg.result_dir(int(state.step)),
                                 news_loader=news_loader,
                                 hidden_dim=hidden_dim, fast=cfg.fast)
        logger.info("predictions written to %s", path)
        return {"prediction_path": path}
    if cfg.mode == "recall":
        # the reference declares a recall mode and ships BM25/inverted-
        # index utilities for it (reference utils/Manager.py:52, 117-119;
        # utils/utils.py:219-410) but has no loader branch or model
        # support — dead in practice. Here it works end-to-end: a
        # token-level BM25 inverted index over the split's news recalls
        # candidates from each user's history tokens; reports recall@K
        # against the impression's clicked positives.
        from ..utils.bm25 import BM25Token, construct_inverted_index
        news_tokens, _ = data.news["dev"].truncated(cfg.signal_length)
        toks = [row[row != 0] for row in news_tokens]
        bm25 = BM25Token(toks)
        vocab = int(news_tokens.max()) + 1
        top_k = 100
        inv = construct_inverted_index(toks, bm25, vocab_size=vocab,
                                       top_k=top_k)
        b = data.behaviors["dev"]
        ks = (20, 50, 100)
        hits = {k: 0.0 for k in ks}
        total = 0
        n_news = len(toks)
        for i in range(len(b)):
            cdd = b.cdd_flat[b.cdd_offsets[i]:b.cdd_offsets[i + 1]]
            lab = b.labels_flat[b.cdd_offsets[i]:b.cdd_offsets[i + 1]]
            positives = set(int(c) for c, l in zip(cdd, lab) if l > 0)
            if not positives:
                continue
            his = b.his_flat[b.his_offsets[i]:b.his_offsets[i + 1]]
            scores = np.zeros(n_news + 1)
            for t in set(int(t) for h in his for t in news_tokens[h]
                         if t != 0):
                postings = inv[t]
                scores[postings[:, 0].astype(np.int64)] += postings[:, 1]
            order = np.argsort(-scores[:n_news])
            for k in ks:
                got = len(positives & set(order[:k].tolist()))
                hits[k] += got / len(positives)
            total += 1
        result = {f"recall@{k}": round(hits[k] / max(total, 1), 4)
                  for k in ks}
        print(result)
        log_result(cfg.name + "__bm25recall", cfg.scale, 0, result)
        return result
    if cfg.mode == "analyse":
        # the reference declares this mode but never implements a handler
        # (utils/Manager.py:45 lists it; no dispatch exists); here it
        # reports corpus statistics (utils/data_tools.statistic_mind,
        # the counterpart of reference utils/utils.py:140-190)
        from ..experiment import split_dir
        from ..utils.data_tools import statistic_mind
        stats = statistic_mind(split_dir(cfg, "train"))
        for k, v in stats.items():
            print(f"{k}: {v}")
        return stats
    if cfg.mode == "inspect":
        # the reference declares this mode but its implementation is
        # missing (plm.py:48 calls an undefined method); here it decodes
        # a few training samples and summarises the parameter tree
        tok = data.tokenizer
        inv = {v: k for k, v in getattr(tok, "vocab", {}).items()}
        batch = sample_batch
        print(f"model: {cfg.name}")
        n_params = sum(int(np.prod(p.shape)) for p in
                       jax.tree_util.tree_leaves(state.params))
        print(f"parameters: {n_params:,}")
        for i in range(min(2, len(batch["label"]))):
            pos = int(batch["label"][i])
            toks = [int(t) for t in np.asarray(batch["cdd_token"][i, pos])
                    if t != 0]
            words = " ".join(inv.get(t, f"<{t}>") for t in toks[:16])
            print(f"sample {i}: user={int(batch['user_id'][i])} "
                  f"positive=[{words} ...]")
        return {"n_params": n_params}
    if cfg.mode == "encode":
        loader = build_history_loader(cfg, data, "dev")
        encode = jax.jit(lambda p, b: model.apply(
            p, b["his_token"], b["his_attn"], b["his_mask"], b["user_id"],
            method=type(model).encode_user))
        batch = next(iter(loader))
        # a device->host transfer is the only sync that provably drains
        # the remote tunnel backend (block_until_ready does not)
        float(encode(state.params, batch).reshape(-1)[0])  # compile
        n = 0
        t0 = time.time()
        for batch in loader:
            float(encode(state.params, batch).reshape(-1)[0])
            n += len(batch["user_id"])
        dt = time.time() - t0
        logger.info("encoded %d users in %.3fs (%.1f users/s)", n, dt,
                    n / max(dt, 1e-9))
        return {"users_per_s": n / max(dt, 1e-9)}
    raise ValueError(f"unknown mode {cfg.mode}")
