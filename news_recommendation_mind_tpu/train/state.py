"""Train state and the two-LR-group optimizer.

The reference trains with one Adam whose param groups are split by
name-regex "bert" → bert_lr vs lr (reference utils/Manager.py:389-413),
plus an optional HF linear-warmup schedule (utils/Manager.py:416-420).
Here the same split is an `optax.multi_transform` keyed on parameter tree
paths, and the schedule is an optax schedule. State is a flax struct pytree
(donate-able in the jitted step).
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray            # scalar int32
    params: Any
    opt_state: Any


def _path_contains(path, needle: str) -> bool:
    return any(needle in str(getattr(k, "key", k)).lower() for k in path)


def make_optimizer(lr: float, bert_lr: float, *, scheduler: str = "none",
                   warmup: int = 0, total_steps: int = 10000,
                   bert_key: str = "bert") -> optax.GradientTransformation:
    """Adam with two LR groups split by parameter path.

    Parameters whose tree path contains `bert_key` (the PLM trunk) get
    bert_lr; everything else gets lr — the reference's name-regex split
    (utils/Manager.py:389-413).
    """
    def sched(base: float) -> optax.Schedule:
        if scheduler == "linear":
            # linear warmup then linear decay to 0 (HF
            # get_linear_schedule_with_warmup semantics)
            return optax.join_schedules([
                optax.linear_schedule(0.0, base, max(warmup, 1)),
                optax.linear_schedule(base, 0.0,
                                      max(total_steps - warmup, 1)),
            ], [max(warmup, 1)])
        return lambda _: base

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "bert" if _path_contains(path, bert_key)
            else "main", params)

    return optax.multi_transform(
        {"main": optax.inject_hyperparams(optax.adam)(sched(lr)),
         "bert": optax.inject_hyperparams(optax.adam)(sched(bert_lr))},
        label_fn)


def create_train_state(params: Any,
                       optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params))
