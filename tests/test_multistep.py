"""Multi-step fused train call vs K single steps."""
import os

import numpy as np
import pytest

import jax

from news_recommendation_mind_tpu.config import Config
from news_recommendation_mind_tpu.experiment import (
    build_data, build_eval_loaders, build_model, build_train_loader,
)
from news_recommendation_mind_tpu.train import (
    Trainer, create_train_state, make_optimizer, make_train_step,
)
from news_recommendation_mind_tpu.train.step import make_train_multistep


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("ms"))
    cfg = Config(scale="synthetic", data_root=os.path.join(tmp, "data"),
                 cache_root=os.path.join(tmp, "cache"),
                 ckpt_root=os.path.join(tmp, "ckpt"),
                 result_root=os.path.join(tmp, "results"),
                 batch_size=16, his_size=10, signal_length=12,
                 hidden_dim=32, embedding_dim=32, head_num=4, epochs=1,
                 lr=1e-3, dtype="float32", device_gather=False,
                 interval=1000,
                 mesh_shape=(1,))  # K-step fusion semantics, not sharding
    data = build_data(cfg)
    model = build_model(cfg, data.vocab_size, data.user_num)
    return cfg, data, model


def test_multistep_equals_sequential_steps(setup):
    cfg, data, model = setup
    K = 4
    loader = build_train_loader(cfg, data)
    batches = []
    for b, _ in zip(loader, range(K)):
        batches.append(b)
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}

    params = model.init(jax.random.PRNGKey(0), batches[0])
    opt = make_optimizer(cfg.lr, cfg.bert_lr)
    rng = jax.random.PRNGKey(3)

    state_seq = create_train_state(params, opt)
    single = make_train_step(model, opt, donate=False)
    for b in batches:
        state_seq, m_seq = single(state_seq, b, rng)

    state_ms = create_train_state(params, opt)
    multi = make_train_multistep(model, opt, steps_per_call=K,
                                 donate=False)
    state_ms, m_ms = multi(state_ms, stacked, rng)

    assert int(state_ms.step) == int(state_seq.step) == K
    np.testing.assert_allclose(float(m_ms["loss"]), float(m_seq["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_ms.params),
                    jax.tree_util.tree_leaves(state_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multistep_grad_norm_metric(setup):
    """--grad_norm with steps_per_call>1 must trace: the scan carry's
    metrics dict has to match the body's (advisor round-2 medium)."""
    cfg, data, model = setup
    K = 2
    loader = build_train_loader(cfg, data)
    batches = [b for b, _ in zip(loader, range(K))]
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    params = model.init(jax.random.PRNGKey(0), batches[0])
    opt = make_optimizer(cfg.lr, cfg.bert_lr)
    state = create_train_state(params, opt)
    multi = make_train_multistep(model, opt, steps_per_call=K,
                                 donate=False, with_grad_norm=True)
    state, m = multi(state, stacked, jax.random.PRNGKey(3))
    assert int(state.step) == K
    assert float(m["grad_norm"]) > 0.0


@pytest.mark.slow
def test_trainer_multistep_learns(setup):
    cfg, data, model = setup
    cfg = cfg.replace(steps_per_call=4, epochs=2, encoderU="attn",
                      device_gather=True)
    model = build_model(cfg, data.vocab_size, data.user_num)
    loader = build_train_loader(cfg, data)
    news_loader, eval_loader = build_eval_loaders(cfg, data)
    trainer = Trainer(cfg, model, loader, news_loader, eval_loader)
    metrics = trainer.train()
    assert metrics["auc"] > 0.62, metrics
