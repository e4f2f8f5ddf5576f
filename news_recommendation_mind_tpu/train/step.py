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

from ..models.two_tower import train_loss
from .state import TrainState


def make_train_step(model, optimizer: optax.GradientTransformation, *,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    state_sharding=None,
                    remat: bool = False) -> Callable:
    """Build the jitted train step: (state, batch, rng) → (state, metrics).

    state_sharding: optional pytree of NamedShardings matching the
    TrainState (from parallel.sharded_embedding.state_shardings) — used
    when parameters are model-sharded (row-sharded embedding tables) so
    the state stays on its shards across steps; default is replicated.
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                rng: jax.Array):
        # fold the step counter in so dropout differs per step but the
        # whole run stays reproducible from one seed
        step_rng = jax.random.fold_in(rng, state.step)

        def forward(params, batch, step_rng):
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
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

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
