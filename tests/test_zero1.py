"""ZeRO-1 optimizer-state sharding: exactness vs replicated Adam.

SURVEY §2.5's "cheap win" row / round-1 VERDICT item 9: dense-tower Adam
moments shard over the 'data' mesh axis (parallel/sharded_embedding.py
partition_rules zero1_axis). Adam's update is elementwise, so sharded
moments must produce *identical* parameters to replicated moments — the
repo's exactness bar (CLAUDE.md) pinned here on the 8-device CPU mesh.
"""
import os

import jax
import numpy as np
import pytest

from news_recommendation_mind_tpu.config import Config
from news_recommendation_mind_tpu.experiment import (
    build_data, build_model, build_train_loader)
from news_recommendation_mind_tpu.parallel import make_mesh, shard_batch
from news_recommendation_mind_tpu.parallel.sharded_embedding import (
    partition_rules, shard_train_state, state_shardings)
from news_recommendation_mind_tpu.train import (
    create_train_state, make_optimizer, make_train_step)
from news_recommendation_mind_tpu.data.loader import ensure_tokens

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs a multi-device mesh")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("zero1"))
    cfg = Config(scale="synthetic", data_root=os.path.join(tmp, "data"),
                 cache_root=os.path.join(tmp, "cache"),
                 batch_size=16, his_size=6, signal_length=10,
                 hidden_dim=32, embedding_dim=32, head_num=4,
                 dtype="float32", device_gather=False)
    data = build_data(cfg, splits=("train",))
    model = build_model(cfg, data.vocab_size, data.user_num)
    loader = build_train_loader(cfg, data)
    batches = []
    it = iter(loader)
    for _ in range(4):
        batches.append(ensure_tokens(next(it), loader))
    params = model.init(jax.random.PRNGKey(0), batches[0])
    return cfg, model, params, batches


def _run(model, params, batches, mesh, state_sharding=None):
    opt = make_optimizer(1e-3, 1e-4)
    state = create_train_state(params, opt)
    if state_sharding is not None:
        rule = partition_rules(mesh, zero1_axis="data")
        state = shard_train_state(state, mesh, rule)
        sharding = state_shardings(state, mesh, rule)
    else:
        sharding = None
    step = make_train_step(model, opt, mesh=mesh, donate=False,
                           state_sharding=sharding)
    key = jax.random.PRNGKey(7)
    for b in batches:
        state, metrics = step(state, shard_batch(b, mesh), key)
    return state, float(metrics["loss"])


def test_zero1_moments_are_sharded_and_exact(setup):
    cfg, model, params, batches = setup
    mesh = make_mesh()
    assert mesh.shape["data"] >= 2

    state_repl, loss_repl = _run(model, params, batches, mesh)
    state_z1, loss_z1 = _run(model, params, batches, mesh,
                             state_sharding=True)

    # the big moment leaves really LIVE sharded over 'data' (placement
    # of the post-step arrays, not just the rule's intent)
    n_sharded = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            state_z1.opt_state):
        if hasattr(leaf, "sharding") and "data" in tuple(
                getattr(leaf.sharding, "spec", ())):
            n_sharded += 1
    assert n_sharded >= 8, n_sharded  # mu+nu for the 4 big leaves
    # and the replicated run's moments are NOT sharded
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            state_repl.opt_state):
        assert "data" not in tuple(getattr(
            getattr(leaf, "sharding", None), "spec", ()) or ())

    # exactness: the Adam update math is identical element-for-element;
    # the only admissible difference is gradient-psum reduction order
    # (XLA re-partitions the backward under the new out-shardings),
    # which is float32-ulp scale — measured worst abs diff 2.98e-8
    # after 4 steps on the 8-device mesh
    assert loss_repl == loss_z1
    for a, b in zip(jax.tree_util.tree_leaves(state_repl.params),
                    jax.tree_util.tree_leaves(state_z1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-7)


def test_zero1_trainer_flag(setup, tmp_path):
    """--zero1 wires through the Trainer (state_sharding set)."""
    cfg, model, params, batches = setup
    from news_recommendation_mind_tpu.train import Trainer
    from news_recommendation_mind_tpu.experiment import build_data, \
        build_train_loader
    cfg2 = cfg.replace(zero1=True, ckpt_root=str(tmp_path),
                       result_root=str(tmp_path), epochs=1)
    data = build_data(cfg2, splits=("train",))
    loader = build_train_loader(cfg2, data)
    model2 = build_model_cached(cfg2, data)
    trainer = Trainer(cfg2, model2, loader)
    assert trainer.state_sharding is not None
    batch = ensure_tokens(next(iter(loader)), loader)
    state, metrics = trainer.train_step(
        trainer.state, shard_batch(batch, trainer.mesh), trainer.rng)
    assert np.isfinite(float(metrics["loss"]))


def build_model_cached(cfg, data):
    return build_model(cfg, data.vocab_size, data.user_num)
