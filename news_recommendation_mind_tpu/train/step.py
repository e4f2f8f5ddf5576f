"""Jitted train/eval steps over the mesh.

One compiled executable replaces the reference's per-step Python
orchestration (reference utils/Manager.py:634-651: zero_grad → forward →
NLL → backward → step): here forward+backward+Adam fuse into a single XLA
program with the train state donated (no reallocation per step) and the
gradient all-reduce implied by shardings (params replicated, batch sharded
over 'data' → XLA inserts the psum over ICI, replacing DDP/NCCL).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.two_tower import forward_from_unique, train_loss
from .state import TrainState


def _build_step_fn(model, optimizer, remat: bool, news_table,
                   with_grad_norm: bool = False):
    """The un-jitted single-step body shared by the step builders."""
    derive_attn = False
    if news_table is not None:
        import numpy as _np
        tok_np = _np.asarray(news_table[0])
        attn_np = _np.asarray(news_table[1])
        # attention masks are usually exactly (token != PAD) thanks to the
        # cache's forced-final-SEP invariant; when that holds, gather only
        # tokens and derive masks on device (half the gather traffic)
        derive_attn = bool(_np.array_equal(attn_np > 0, tok_np != 0))
        tok_table = jnp.asarray(news_table[0])
        if not derive_attn:
            attn_table = jnp.asarray(news_table[1], jnp.float32)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                rng: jax.Array):
        dedup = "uniq_id" in batch and news_table is not None
        if news_table is not None:
            batch = dict(batch)
            if dedup:
                # batch-level news dedup: gather tokens only for the
                # batch's unique articles; the model encodes those once
                # and indexes per slot (models/two_tower.py
                # forward_from_unique)
                batch["uniq_token"] = jnp.take(tok_table, batch["uniq_id"],
                                               axis=0, mode="clip")
                if derive_attn:
                    batch["uniq_attn"] = (batch["uniq_token"] != 0).astype(
                        jnp.float32)
                else:
                    batch["uniq_attn"] = jnp.take(attn_table,
                                                  batch["uniq_id"], axis=0)
            else:
                batch["cdd_token"] = jnp.take(tok_table, batch["cdd_id"],
                                              axis=0, mode="clip")
                batch["his_token"] = jnp.take(tok_table, batch["his_id"],
                                              axis=0, mode="clip")
                if derive_attn:
                    batch["cdd_attn"] = (batch["cdd_token"] != 0).astype(
                        jnp.float32)
                    batch["his_attn"] = (batch["his_token"] != 0).astype(
                        jnp.float32)
                else:
                    batch["cdd_attn"] = jnp.take(attn_table,
                                                 batch["cdd_id"], axis=0)
                    batch["his_attn"] = jnp.take(attn_table,
                                                 batch["his_id"], axis=0)
        # fold the step counter in so dropout differs per step but the
        # whole run stays reproducible from one seed
        step_rng = jax.random.fold_in(rng, state.step)

        def forward(params, batch, step_rng):
            if dedup:
                return model.apply(params, batch, False,
                                   rngs={"dropout": step_rng},
                                   method=forward_from_unique)
            return model.apply(params, batch, deterministic=False,
                               rngs={"dropout": step_rng})

        if remat:
            # recompute the forward during backward instead of saving
            # activations — trades FLOPs for HBM on big PLM configs
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            scores = forward(params, batch, step_rng)
            return train_loss(scores, batch["label"], batch.get("cdd_mask"))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if hasattr(optimizer, "fused_apply"):
            # FusedAdam: the apply-updates add folds into the per-leaf
            # Pallas kernel (train/state.py make_fused_optimizer)
            params, opt_state = optimizer.fused_apply(
                state.params, state.opt_state, grads)
        else:
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        metrics = {"loss": loss.astype(jnp.float32)}
        if with_grad_norm:
            # a full extra read of every gradient leaf (~1.5ms/step at
            # flagship dims); opt-in diagnostics — the reference logs no
            # norms either (utils/Manager.py:634-651)
            metrics["grad_norm"] = optax.global_norm(grads).astype(
                jnp.float32)
        return new_state, metrics

    return step_fn


def make_train_step(model, optimizer: optax.GradientTransformation, *,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    state_sharding=None,
                    remat: bool = False,
                    news_table=None,
                    with_grad_norm: bool = False) -> Callable:
    """Build the jitted train step: (state, batch, rng) → (state, metrics).

    state_sharding: optional pytree of NamedShardings matching the
    TrainState (from parallel.sharded_embedding.state_shardings) — used
    when parameters are model-sharded (row-sharded embedding tables) so
    the state stays on its shards across steps; default is replicated.

    news_table: optional (tokens [n_news+1, sl], attn [n_news+1, sl])
    device arrays. When given, batches carry only candidate/history *ids*
    and the token matrices are gathered in HBM inside the step — on
    remote/multi-host setups this cuts host→device traffic ~60x (ids are
    ~1KB/sample vs ~40KB of gathered tokens).
    """
    step_fn = _build_step_fn(model, optimizer, remat, news_table,
                             with_grad_norm)

    kw = {}
    if donate:
        kw["donate_argnums"] = (0,)
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        state_s = state_sharding if state_sharding is not None else repl
        kw["in_shardings"] = (state_s, data, repl)
        kw["out_shardings"] = (state_s, repl)
    return jax.jit(step_fn, **kw)


def make_train_multistep(model, optimizer: optax.GradientTransformation, *,
                         steps_per_call: int,
                         mesh: Optional[Mesh] = None,
                         donate: bool = True,
                         state_sharding=None,
                         remat: bool = False,
                         news_table=None,
                         with_grad_norm: bool = False) -> Callable:
    """K train steps in ONE jitted call via lax.scan over a superbatch.

    Batches arrive stacked on a leading [K, ...] axis; the device loops
    without returning to the host, so per-call overhead (dispatch /
    tunnel RPC latency) is amortized K-fold. Combine with device-side
    gather (news_table) to keep the superbatch at ids-only size. Returns
    (state, metrics-of-last-step).
    """
    single = _build_step_fn(model, optimizer, remat, news_table,
                            with_grad_norm)

    def multi_fn(state: TrainState, batches: Dict[str, jnp.ndarray],
                 rng: jax.Array):
        def body(carry, batch):
            st, _ = carry
            st, metrics = single(st, batch, rng)
            return (st, metrics), None

        init_metrics = {"loss": jnp.zeros((), jnp.float32)}
        if with_grad_norm:
            # carry structure must match the body's metrics dict exactly
            # or lax.scan rejects the trace
            init_metrics["grad_norm"] = jnp.zeros((), jnp.float32)
        (state, metrics), _ = jax.lax.scan(body, (state, init_metrics),
                                           batches)
        return state, metrics

    kw = {}
    if donate:
        kw["donate_argnums"] = (0,)
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        # leading axis is the step axis; batch dim (axis 1) is sharded
        data = NamedSharding(mesh, P(None, "data"))
        state_s = state_sharding if state_sharding is not None else repl
        kw["in_shardings"] = (state_s, data, repl)
        kw["out_shardings"] = (state_s, repl)
    return jax.jit(multi_fn, **kw)


def make_eval_score_fn(model, *, mesh: Optional[Mesh] = None) -> Callable:
    """Jitted full-forward scorer for the slow eval path: batch → sigmoid
    scores [B, C] (reference models/TwoTowerBaseModel.py:72-73)."""

    def score_fn(params, batch):
        scores = model.apply(params, batch, deterministic=True)
        return jax.nn.sigmoid(scores)

    kw = {}
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        kw["in_shardings"] = (repl, data)
        kw["out_shardings"] = data
    return jax.jit(score_fn, **kw)
