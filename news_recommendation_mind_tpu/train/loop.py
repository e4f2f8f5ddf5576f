"""Training orchestration: epochs, periodic eval, best-AUC checkpointing.

Counterpart of the reference's train/_train loop
(reference utils/Manager.py:588-718) with the quirks ironed out:
evaluation runs uniformly every `save_step` steps (or each epoch when 0) on
*every* scale (the reference's gate skips mid-train eval entirely on the
`small` scale, utils/Manager.py:662), and resume restores the full state
including the step counter (see train/checkpoint.py).
"""
from __future__ import annotations

import signal
import threading
import time
from typing import Dict

import jax
import numpy as np

from ..config import Config
from ..data.loader import ensure_tokens, prefetch_to_device
from ..evaluation.engine import evaluate
from ..parallel.mesh import batch_sharding
from ..utils.logging import get_logger, log_result
from .checkpoint import (latest_step, load_checkpoint, save_checkpoint,
                         wait_for_pending_saves)
from .state import create_train_state, optimizer_for
from .step import make_train_multistep, make_train_step

logger = get_logger("train")


def _superbatches(iterator, k: int):
    """Group K consecutive batches into one [K, ...]-stacked superbatch."""
    import numpy as _np
    group = []
    for batch in iterator:
        group.append(batch)
        if len(group) == k:
            yield {key: _np.stack([b[key] for b in group])
                   for key in group[0]}
            group = []
    # drop the ragged tail: fixed shapes keep one compiled executable


class Trainer:
    """Drives one experiment: state init/resume, the jitted step over the
    mesh, periodic evaluation, and artifact management."""

    def __init__(self, cfg: Config, model, train_loader,
                 news_loader=None, eval_loader=None,
                 mesh=None, sample_batch=None):
        from ..config import apply_compile_cache, apply_rng_impl
        from ..parallel.mesh import mesh_from_config
        apply_rng_impl(cfg)  # before any PRNGKey exists (hardware RNG on
        apply_compile_cache(cfg)
        self.cfg = cfg       # TPU: dropout-mask remat is ~free, config.py)
        self.model = model
        self.train_loader = train_loader
        self.news_loader = news_loader
        self.eval_loader = eval_loader
        self.mesh = mesh if mesh is not None else mesh_from_config(cfg)
        total_steps = cfg.epochs * max(len(train_loader), 1)
        self.optimizer = optimizer_for(cfg, total_steps=total_steps)
        if sample_batch is None:
            sample_batch = next(iter(train_loader))
        sample_batch = ensure_tokens(sample_batch, train_loader)
        params = model.init(jax.random.PRNGKey(cfg.seed),
                            {k: v for k, v in sample_batch.items()})
        if cfg.model in ("plm", "xformer"):
            # pretrained init from a locally cached HF checkpoint, the
            # reference's AutoModel.from_pretrained path (models/PLM.py)
            from ..experiment import maybe_load_hf_weights
            params, _ = maybe_load_hf_weights(cfg, params)
        self.state = create_train_state(params, self.optimizer)
        if cfg.checkpoint:
            # -1 = newest checkpoint (the preemption-resume path)
            step_arg = None if cfg.checkpoint < 0 else cfg.checkpoint
            self.state = load_checkpoint(cfg.ckpt_dir(), cfg.scale,
                                         self.state, step=step_arg)
            logger.info("resumed from step %d", int(self.state.step))
        # row-sharded tables (mesh 'model' axis > 1): keep the state on
        # its shards across steps (dryrun_multichip's layout, now the
        # Trainer path for --model-parallel)
        self.state_sharding = None
        zero1_axis = ("data" if cfg.zero1
                      and self.mesh.shape.get("data", 1) > 1 else None)
        if self.mesh.shape.get("model", 1) > 1 or zero1_axis:
            from ..parallel import (partition_rules, shard_train_state,
                                    state_shardings)
            vt = getattr(getattr(model, "embedding", None),
                         "vocab_size", None)
            if vt is None:
                # PLM/XFormer expose no `embedding`; their row-shardable
                # table is the BERT word table — pin the threshold to its
                # vocab so exactly that table (and its Adam moments)
                # shards under --model-parallel (SURVEY §2.5's multi-host
                # PLM row; tests/test_model_parallel.py::
                # test_trainer_model_parallel_plm)
                bert = getattr(model, "bert", None)
                vt = getattr(getattr(bert, "cfg", None), "vocab_size",
                             None)
            kw = dict(zero1_axis=zero1_axis)
            if vt:
                kw["vocab_threshold"] = vt
            rule = partition_rules(self.mesh, **kw)
            self._shard_rule = rule
            self.state = shard_train_state(self.state, self.mesh, rule)
            self.state_sharding = state_shardings(self.state, self.mesh,
                                                  rule)
        news_table = None
        if cfg.device_gather and getattr(train_loader, "emit_tokens",
                                         True) is False:
            news_table = (train_loader.news_tokens, train_loader.news_attn)
        if cfg.steps_per_call > 1:
            # superbatches stack K batches on a leading axis — dedup's
            # bucketed unique-pool widths must be pinned to one width or
            # the stack has ragged shapes
            if getattr(train_loader, "dedup", False):
                train_loader.u_quantum = train_loader.u_pad
            self.train_step = make_train_multistep(
                model, self.optimizer, steps_per_call=cfg.steps_per_call,
                mesh=self.mesh, donate=cfg.donate, remat=cfg.remat,
                state_sharding=self.state_sharding, news_table=news_table,
                with_grad_norm=cfg.grad_norm)
        else:
            self.train_step = make_train_step(
                model, self.optimizer, mesh=self.mesh, donate=cfg.donate,
                remat=cfg.remat, state_sharding=self.state_sharding,
                news_table=news_table, with_grad_norm=cfg.grad_norm)
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.best_auc = -1.0
        self.nan_recoveries = 0
        self.data_sharding = batch_sharding(self.mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P
        # superbatches: leading step axis replicated, batch axis sharded
        self.super_sharding = NamedSharding(self.mesh, P(None, "data"))

    # ------------------------------------------------------------------
    def evaluate_now(self) -> Dict[str, float]:
        if self.eval_loader is None:
            return {}
        hidden_dim = getattr(self.model, "hidden_dim", self.cfg.hidden_dim)
        return evaluate(self.model, self.state.params, self.eval_loader,
                        self.cfg.metric_list, news_loader=self.news_loader,
                        hidden_dim=hidden_dim, fast=self.cfg.fast,
                        save_table_path=self.cfg.news_repr_path("dev"))

    def _maybe_eval_and_save(self) -> None:
        """Mid-train eval + best/periodic checkpoints.

        evaluate() returns identical metrics on EVERY process (the
        gathered result lists are global), so the best-AUC branch — and
        with it save_checkpoint's gather collectives and barrier — runs
        symmetrically on all processes (the reference's rank-0-gated
        save around a barrier, utils/Manager.py:673-680). Only logging
        is gated to process 0 (one ledger line per eval).
        """
        step = int(self.state.step)
        metrics = self.evaluate_now()
        if metrics:
            if jax.process_index() == 0:
                logger.info("step %d eval: %s", step, metrics)
                log_result(self.cfg.name, self.cfg.scale, step, metrics)
            auc = metrics.get("auc", 0.0)
            if auc > self.best_auc:
                self.best_auc = auc
                save_checkpoint(self.cfg.ckpt_dir(), self.cfg.scale,
                                self.state, best=True,
                                async_save=self.cfg.async_save)
        save_checkpoint(self.cfg.ckpt_dir(), self.cfg.scale, self.state,
                        async_save=self.cfg.async_save)

    def _handle_nan(self) -> None:
        """Failure recovery (SURVEY §5.3 gap): on a non-finite loss,
        restore the newest checkpoint and continue — bounded by
        cfg.nan_recover; fail fast otherwise/afterwards."""
        self.nan_recoveries += 1
        cfg = self.cfg
        step = latest_step(cfg.ckpt_dir(), cfg.scale)
        if cfg.nan_recover and self.nan_recoveries <= cfg.nan_recover \
                and step is not None:
            wait_for_pending_saves()
            logger.warning(
                "non-finite loss; restoring checkpoint step %d "
                "(recovery %d/%d)", step, self.nan_recoveries,
                cfg.nan_recover)
            self.state = load_checkpoint(cfg.ckpt_dir(), cfg.scale,
                                         jax.device_get(self.state),
                                         step=step)
            if self.state_sharding is not None:
                from ..parallel import shard_train_state
                self.state = shard_train_state(self.state, self.mesh,
                                               self._shard_rule)
            return
        raise FloatingPointError(
            "non-finite training loss (use --anomaly to locate the op, "
            "or --nan_recover N to auto-restore from checkpoints)")

    # ------------------------------------------------------------------
    def _install_preemption_handler(self):
        """SIGTERM/SIGINT (TPU maintenance events, scheduler preemption)
        set a flag; the step loop drains to a synchronous checkpoint and
        exits cleanly so `--checkpoint`-less resume (latest_step) picks up
        exactly where training stopped. The reference has no preemption
        story (SURVEY §5.3: recovery = manual --checkpoint N).
        Returns the previous handlers for restoration; no-op off the main
        thread (signal.signal raises there)."""
        self.preempted = threading.Event()

        def _on_term(signum, frame):
            if self.preempted.is_set() and signum == signal.SIGINT:
                # second Ctrl+C: the user wants out NOW (e.g. stuck in a
                # long compile before any step boundary can drain)
                raise KeyboardInterrupt
            logger.warning("signal %d: checkpointing at next step boundary"
                           " (interrupt again to abort immediately)",
                           signum)
            self.preempted.set()

        previous = []
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                previous.append((sig, signal.signal(sig, _on_term)))
            except ValueError:  # not the main thread (e.g. under a test
                pass            # runner worker) — flag still usable
        return previous

    def _checkpoint_and_stop(self) -> None:
        wait_for_pending_saves()
        save_checkpoint(self.cfg.ckpt_dir(), self.cfg.scale, self.state,
                        async_save=False)
        logger.warning("preempted: checkpoint written at step %d; "
                       "resume with --checkpoint %d (or latest)",
                       int(self.state.step), int(self.state.step))

    # ------------------------------------------------------------------
    def train(self) -> Dict[str, float]:
        previous_handlers = self._install_preemption_handler()
        try:
            return self._train_epochs()
        finally:
            for sig, handler in previous_handlers:
                signal.signal(sig, handler)

    def _train_epochs(self) -> Dict[str, float]:
        cfg = self.cfg
        steps_done = 0
        t0 = time.time()
        examples = 0
        for epoch in range(cfg.epochs):
            self.train_loader.set_epoch(epoch)
            source = iter(self.train_loader)
            if cfg.steps_per_call > 1:
                source = _superbatches(source, cfg.steps_per_call)
            it = prefetch_to_device(source, size=cfg.prefetch,
                                    sharding=(self.super_sharding
                                              if cfg.steps_per_call > 1
                                              else self.data_sharding))
            for batch in it:
                if cfg.profile_dir and steps_done == 10:
                    # capture steps 10-14 (past compile/warmup); view with
                    # tensorboard or xprof (SURVEY §5.1's tracing gap)
                    jax.profiler.start_trace(cfg.profile_dir)
                self.state, metrics = self.train_step(self.state, batch,
                                                      self.rng)
                if cfg.profile_dir and steps_done == 14:
                    float(metrics["loss"])  # drains the device (tunnel-safe)
                    jax.profiler.stop_trace()
                    logger.info("profiler trace written to %s",
                                cfg.profile_dir)
                steps_done += cfg.steps_per_call
                examples += cfg.batch_size * cfg.steps_per_call
                if self.preempted.is_set():
                    self._checkpoint_and_stop()
                    return {}
                if steps_done % cfg.interval == 0:
                    loss = float(metrics["loss"])
                    rate = examples / (time.time() - t0)
                    logger.info(
                        "epoch %d step %d loss %.4f (%.0f ex/s)",
                        epoch, int(self.state.step), loss, rate)
                    if not np.isfinite(loss):
                        self._handle_nan()
                if cfg.save_step and steps_done % cfg.save_step == 0 \
                        and steps_done >= cfg.hold_step:
                    self._maybe_eval_and_save()
                if cfg.step_budget and steps_done >= cfg.step_budget:
                    break
            if not cfg.save_step:
                self._maybe_eval_and_save()
            if cfg.step_budget and steps_done >= cfg.step_budget:
                break
        wait_for_pending_saves()
        final = self.evaluate_now()
        if final and jax.process_index() == 0:
            logger.info("final eval: %s (best auc %.4f)", final,
                        self.best_auc)
        return final
