"""Train state and the two-LR-group optimizer.

The reference trains with one Adam whose param groups are split by
name-regex "bert" → bert_lr vs lr (reference utils/Manager.py:389-413),
plus an optional HF linear-warmup schedule (utils/Manager.py:416-420).
Here the same split is an `optax.multi_transform` keyed on parameter tree
paths, and the schedule is an optax schedule. State is a flax struct pytree
(donate-able in the jitted step).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

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

    # plain optax.adam with a schedule (not inject_hyperparams: the
    # inject wrapper computes updates a few ulps differently from
    # optax.adam itself, which would make the flat-buffer optimizer's
    # bitwise-equality pin ambiguous about which formulation is "the"
    # reference)
    return optax.multi_transform(
        {"main": optax.adam(sched(lr)),
         "bert": optax.adam(sched(bert_lr))},
        label_fn)


class FusedAdamState(NamedTuple):
    count: jnp.ndarray                 # scalar int32
    mu: Any                            # per-leaf first moments
    nu: Any                            # per-leaf second moments


class FusedAdam(NamedTuple):
    """make_optimizer's exact math with a TPU-fused apply path.

    Duck-types optax.GradientTransformation (init/update) and adds
    ``fused_apply(params, state, grads) -> (new_params, new_state)``,
    which train/step.py prefers: each eligible leaf runs the fused
    Pallas Adam kernel (ops/pallas_adam.py) — native-tiling streaming at
    ~770 GB/s vs ~85 GB/s for XLA's per-leaf T(8,128) fusions, with the
    apply-updates add folded in (BASELINE.md round-3 substrate
    measurements). The jnp formulation used off-TPU (and by update()) is
    pinned bitwise against optax.adam by
    tests/test_train.py::test_fused_optimizer_matches_reference.
    """
    init: Any
    update: Any
    fused_apply: Any


def _adam_scalars(count, b1: float, b2: float, lr):
    """[bias_correction1, bias_correction2, lr] for the incremented count
    (integer-exponent pow matches optax's ``decay**count`` bitwise)."""
    bc1 = 1.0 - b1 ** count
    bc2 = 1.0 - b2 ** count
    return bc1, bc2, lr


def make_fused_optimizer(lr: float, bert_lr: float, *,
                         scheduler: str = "none", warmup: int = 0,
                         total_steps: int = 10000,
                         bert_key: str = "bert",
                         b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8) -> "FusedAdam":
    def sched(base: float):
        if scheduler == "linear":
            w = max(warmup, 1)
            d = max(total_steps - warmup, 1)

            def fn(count):
                c = count.astype(jnp.float32)
                up = base * c / w
                down = base * jnp.maximum(1.0 - (c - w) / d, 0.0)
                return jnp.where(c < w, up, down)
            return fn
        return lambda _: jnp.asarray(base, jnp.float32)

    lrs = {"main": sched(lr), "bert": sched(bert_lr)}

    def leaf_group(path) -> str:
        return "bert" if _path_contains(path, bert_key) else "main"

    def init_fn(params):
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, jnp.float32), params)
        return FusedAdamState(count=jnp.zeros((), jnp.int32),
                              mu=zeros,
                              nu=jax.tree_util.tree_map(jnp.copy, zeros))

    def _leaf_math(p, mu, nu, g, bc1, bc2, step_lr):
        g = g.astype(jnp.float32)
        mu = b1 * mu + (1.0 - b1) * g
        nu = b2 * nu + (1.0 - b2) * (g * g)
        mu_hat = mu / bc1.astype(mu.dtype)
        nu_hat = nu / bc2.astype(nu.dtype)
        upd = (mu_hat / (jnp.sqrt(nu_hat) + eps)) * (-step_lr)
        return upd.astype(p.dtype), mu, nu

    def update_fn(grads, state, params=None):
        """optax-compatible path: returns (updates, new_state)."""
        count = state.count + 1
        bc1, bc2, _ = _adam_scalars(count, b1, b2, None)
        flat, treedef = jax.tree_util.tree_flatten_with_path(grads)
        mus = jax.tree_util.tree_leaves(state.mu)
        nus = jax.tree_util.tree_leaves(state.nu)
        ps = (jax.tree_util.tree_leaves(params)
              if params is not None else [g for _, g in flat])
        upds, new_mu, new_nu = [], [], []
        for (path, g), mu, nu, p in zip(flat, mus, nus, ps):
            step_lr = lrs[leaf_group(path)](state.count)
            u, m2, n2 = _leaf_math(p, mu, nu, g, bc1, bc2, step_lr)
            upds.append(u)
            new_mu.append(m2)
            new_nu.append(n2)
        unf = lambda ls: jax.tree_util.tree_unflatten(treedef, ls)
        return unf(upds), FusedAdamState(count=count, mu=unf(new_mu),
                                         nu=unf(new_nu))

    def fused_apply(params, state, grads):
        """(params, state, grads) -> (new_params, new_state); eligible
        leaves ride the Pallas kernel on TPU backends."""
        from ..ops.pallas_adam import adam_leaf_eligible, adam_leaf_update
        use_kernel = jax.default_backend() in ("tpu", "axon")
        count = state.count + 1
        bc1, bc2, _ = _adam_scalars(count, b1, b2, None)
        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        gs = jax.tree_util.tree_leaves(grads)
        mus = jax.tree_util.tree_leaves(state.mu)
        nus = jax.tree_util.tree_leaves(state.nu)
        new_p, new_mu, new_nu = [], [], []
        for (path, p), mu, nu, g in zip(flat, mus, nus, gs):
            step_lr = lrs[leaf_group(path)](state.count)
            if use_kernel and adam_leaf_eligible(p):
                scalars = jnp.stack([bc1.astype(jnp.float32),
                                     bc2.astype(jnp.float32),
                                     jnp.asarray(step_lr, jnp.float32)])
                p2, m2, n2 = adam_leaf_update(p, mu, nu, g, scalars,
                                              b1=b1, b2=b2, eps=eps)
            else:
                u, m2, n2 = _leaf_math(p, mu, nu, g, bc1, bc2, step_lr)
                p2 = p + u
            new_p.append(p2)
            new_mu.append(m2)
            new_nu.append(n2)
        unf = lambda ls: jax.tree_util.tree_unflatten(treedef, ls)
        return unf(new_p), FusedAdamState(count=count, mu=unf(new_mu),
                                          nu=unf(new_nu))

    return FusedAdam(init=init_fn, update=update_fn,
                     fused_apply=fused_apply)


def optimizer_for(cfg, total_steps: int = 10000
                  ) -> optax.GradientTransformation:
    """The optimizer a Config trains (and restores checkpoints) with.

    Flat-buffer Adam on plain data-parallel configs; the per-leaf
    formulation under ZeRO-1 / model parallelism, whose sharding
    machinery partitions per-leaf moments. Checkpoint templates must be
    built through this same selection (cli/common.py, train/loop.py)."""
    kw = dict(scheduler=cfg.scheduler, warmup=cfg.warmup,
              total_steps=total_steps)
    if cfg.fused_adam and not cfg.zero1 and cfg.model_parallel <= 1:
        return make_fused_optimizer(cfg.lr, cfg.bert_lr, **kw)
    return make_optimizer(cfg.lr, cfg.bert_lr, **kw)


def create_train_state(params: Any,
                       optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params))
