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
    optimizer_for
from ..utils.logging import get_logger, log_result

logger = get_logger("cli")


def _restored_state(cfg: Config, model, sample_batch):
    params = model.init(jax.random.PRNGKey(cfg.seed), sample_batch)
    opt = optimizer_for(cfg)
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
    from ..config import apply_compile_cache, apply_rng_impl
    apply_rng_impl(cfg)
    apply_compile_cache(cfg)
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
        # the reference declares recall_type {s,d,sd} and ships BM25/
        # inverted-index utilities (reference utils/Manager.py:52,
        # 117-119; utils/utils.py:219-410) but has no loader branch or
        # model support — dead in practice. Here all three retrieval
        # types work end-to-end (evaluation/recall.py): s = BM25 over
        # history tokens, d = the trained two-tower scored against the
        # whole encoded-news table on the MXU, sd = reciprocal-rank
        # fusion of both. Reports recall@K against clicked positives.
        from ..evaluation.recall import recall_eval
        recall_type = cfg.recall_type or "s"
        news_tokens, news_attn = data.news["dev"].truncated(
            cfg.signal_length)
        table = None
        if "d" in recall_type:
            from ..data.loader import NewsLoader
            from ..evaluation.engine import encode_all_news
            news_loader = NewsLoader(data.news["dev"],
                                     batch_size=cfg.batch_size_news,
                                     signal_length=cfg.signal_length)
            table = encode_all_news(model, state.params, news_loader,
                                    hidden_dim)
        result = recall_eval(recall_type, data.behaviors["dev"],
                             news_tokens, news_attn, model=model,
                             params=state.params, news_table=table,
                             his_size=cfg.his_size,
                             descend_history=cfg.descend_history)
        if jax.process_index() != 0:
            # like dev/test eval, only process 0 reports (one ledger line)
            return {}
        print(result)
        log_result(f"{cfg.name}__recall_{recall_type}", cfg.scale,
                   int(state.step), result)
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
