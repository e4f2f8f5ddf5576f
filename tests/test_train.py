"""Train stack tests: optimizer grouping, sharded step, checkpoints,
and the end-to-end learning test on synthetic data."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from news_recommendation_mind_tpu.config import Config
from news_recommendation_mind_tpu.evaluation.engine import (
    encode_all_news, evaluate, write_predictions,
)
from news_recommendation_mind_tpu.experiment import (
    build_data, build_eval_loaders, build_model, build_train_loader,
)
from news_recommendation_mind_tpu.parallel import make_mesh
from news_recommendation_mind_tpu.train import (
    Trainer, create_train_state, latest_step, load_checkpoint,
    make_optimizer, make_train_step, save_checkpoint,
)


def small_config(tmp, **kw):
    base = dict(
        scale="synthetic", data_root=os.path.join(tmp, "data"),
        cache_root=os.path.join(tmp, "cache"),
        ckpt_root=os.path.join(tmp, "ckpt"),
        result_root=os.path.join(tmp, "results"),
        batch_size=16, his_size=10, signal_length=12, hidden_dim=32,
        embedding_dim=32, head_num=4, npratio=4, epochs=1,
        lr=1e-3, dtype="float32", interval=50, impr_size=2000,
        device_gather=False,  # these tests drive the host-gather path
        # functional tests run on one device: multi-device semantics are
        # pinned by test_train_step_sharded_equals_single + sharding tests,
        # and long 8-virtual-device collective loops are the suite's
        # SIGABRT exposure (ARCHITECTURE.md suite-stability campaign)
        mesh_shape=(1,),
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("exp"))
    cfg = small_config(tmp)
    data = build_data(cfg)
    model = build_model(cfg, data.vocab_size, data.user_num)
    return tmp, cfg, data, model


def test_optimizer_two_groups():
    params = {"embedding": {"w": jnp.ones((2, 2))},
              "bert_encoder": {"w": jnp.ones((2, 2))}}
    opt = make_optimizer(1e-2, 1e-5)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    # main group moves ~1e-2, bert group ~1e-5 (Adam step ≈ lr for const grad)
    assert abs(float(updates["embedding"]["w"][0, 0])) > 1e-3
    assert abs(float(updates["bert_encoder"]["w"][0, 0])) < 1e-4


def test_train_step_runs_and_descends(setup):
    tmp, cfg, data, model = setup
    loader = build_train_loader(cfg, data)
    batch = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = make_optimizer(cfg.lr, cfg.bert_lr)
    state = create_train_state(params, opt)
    mesh = make_mesh()
    step = make_train_step(model, opt, mesh=mesh, donate=False)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(30):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert int(state.step) == 30
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] - 1e-3  # descends on a repeated batch


def test_train_step_sharded_equals_single(setup):
    """Same batch, 8-device mesh vs 1-device mesh → same loss."""
    tmp, cfg, data, model = setup
    loader = build_train_loader(cfg, data)
    batch = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = make_optimizer(cfg.lr, cfg.bert_lr)
    rng = jax.random.PRNGKey(0)
    mesh8 = make_mesh()
    mesh1 = make_mesh((1,), devices=jax.devices()[:1])
    s8, m8 = make_train_step(model, opt, mesh=mesh8, donate=False)(
        create_train_state(params, opt), batch, rng)
    s1, m1 = make_train_step(model, opt, mesh=mesh1, donate=False)(
        create_train_state(params, opt), batch, rng)
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    l8 = jax.tree_util.tree_leaves(s8.params)
    l1 = jax.tree_util.tree_leaves(s1.params)
    for a, b in zip(l8, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_checkpoint_roundtrip(setup, tmp_path):
    tmp, cfg, data, model = setup
    loader = build_train_loader(cfg, data)
    batch = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = make_optimizer(cfg.lr, cfg.bert_lr)
    state = create_train_state(params, opt)
    step = make_train_step(model, opt, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "ck")
    save_checkpoint(ckpt_dir, "synthetic", state)
    save_checkpoint(ckpt_dir, "synthetic", state, best=True)
    assert latest_step(ckpt_dir, "synthetic") == 1
    template = create_train_state(params, opt)
    restored = load_checkpoint(ckpt_dir, "synthetic", template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_encode_all_news_table(setup):
    tmp, cfg, data, model = setup
    loader = build_train_loader(cfg, data)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    news_loader, _ = build_eval_loaders(cfg, data)
    table = encode_all_news(model, params, news_loader, cfg.hidden_dim)
    assert table.shape == (data.news["dev"].news_num + 1, cfg.hidden_dim)
    assert np.isfinite(table).all()
    assert np.abs(table[1:]).sum() > 0


def test_fast_eval_matches_slow_eval(setup):
    """Two-phase fast eval must equal full-forward slow eval exactly
    (the predict_fast contract, reference TwoTowerBaseModel.py:78-84)."""
    tmp, cfg, data, model = setup
    loader = build_train_loader(cfg, data)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    news_loader, fast_loader = build_eval_loaders(cfg, data)
    slow_cfg = cfg.replace(fast=False)
    _, slow_loader = build_eval_loaders(slow_cfg, data)
    m_fast = evaluate(model, params, fast_loader, ["auc", "mean_mrr"],
                      news_loader=news_loader, hidden_dim=cfg.hidden_dim,
                      fast=True)
    m_slow = evaluate(model, params, slow_loader, ["auc", "mean_mrr"],
                      fast=False)
    assert m_fast == m_slow


def test_trainer_end_to_end_learns(setup):
    """The PR1 north-star slice: synthetic MIND → train → AUC ≫ 0.5."""
    tmp, cfg, data, model = setup
    cfg = cfg.replace(epochs=2, encoderU="attn")
    model = build_model(cfg, data.vocab_size, data.user_num)
    loader = build_train_loader(cfg, data)
    news_loader, eval_loader = build_eval_loaders(cfg, data)
    trainer = Trainer(cfg, model, loader, news_loader, eval_loader)
    metrics = trainer.train()
    assert metrics["auc"] > 0.62, f"model failed to learn: {metrics}"
    # artifacts exist
    assert os.path.exists(cfg.news_repr_path("dev"))
    assert latest_step(cfg.ckpt_dir(), cfg.scale) is not None
    assert os.path.exists("performance.log")


def test_write_predictions_writer(setup, tmp_path):
    tmp, cfg, data, model = setup
    from news_recommendation_mind_tpu.experiment import build_data
    cfg_t = cfg.replace(mode="test")
    data_t = build_data(cfg_t, splits=("train", "test"))
    loader = build_train_loader(cfg_t, data_t)
    params = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    news_loader, eval_loader = build_eval_loaders(cfg_t, data_t,
                                                  split="test")
    out = write_predictions(model, params, eval_loader,
                           str(tmp_path / "res"), news_loader=news_loader,
                           hidden_dim=cfg.hidden_dim)
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 150  # synthetic test impressions
    first = lines[0]
    assert first.startswith("1 [") and first.endswith("]")
    ranks = sorted(int(r) for r in first.split("[")[1][:-1].split(","))
    assert ranks == list(range(1, 21))  # a permutation of 1..20


def test_device_gather_step_matches_host_gather(setup):
    """Ids-only batches + in-HBM token gather == token-ful batches."""
    import jax
    from news_recommendation_mind_tpu.data.loader import ensure_tokens
    tmp, cfg, data, model = setup
    host_loader = build_train_loader(cfg, data)
    dev_loader = build_train_loader(cfg.replace(device_gather=True), data)
    assert dev_loader.emit_tokens is False
    host_batch = next(iter(host_loader))
    dev_batch = next(iter(dev_loader))
    assert "cdd_token" not in dev_batch
    params = model.init(jax.random.PRNGKey(0),
                        ensure_tokens(dict(dev_batch), dev_loader))
    opt = make_optimizer(cfg.lr, cfg.bert_lr)
    rng = jax.random.PRNGKey(0)
    s_host, m_host = make_train_step(model, opt, donate=False)(
        create_train_state(params, opt), host_batch, rng)
    s_dev, m_dev = make_train_step(
        model, opt, donate=False,
        news_table=(dev_loader.news_tokens, dev_loader.news_attn))(
        create_train_state(params, opt), dev_batch, rng)
    # identical example order; negatives come from the same native RNG
    # stream, so the steps see the same data
    np.testing.assert_array_equal(np.asarray(host_batch["cdd_id"]),
                                  np.asarray(dev_batch["cdd_id"]))
    np.testing.assert_allclose(float(m_dev["loss"]), float(m_host["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_dev.params),
                    jax.tree_util.tree_leaves(s_host.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_trainer_resume_continues_from_step(setup):
    """--checkpoint N restores params, opt state, and the step counter
    (the reference loses the step/scheduler on resume)."""
    tmp, cfg, data, model = setup
    cfg = cfg.replace(encoderU="attn", step_budget=10, save_step=10,
                      ckpt_root=os.path.join(tmp, "ckpt_resume"))
    model2 = build_model(cfg, data.vocab_size, data.user_num)
    loader = build_train_loader(cfg, data)
    news_loader, eval_loader = build_eval_loaders(cfg, data)
    t1 = Trainer(cfg, model2, loader, news_loader, eval_loader)
    t1.train()
    assert latest_step(cfg.ckpt_dir(), cfg.scale) == 10

    cfg2 = cfg.replace(checkpoint=10, step_budget=5)
    t2 = Trainer(cfg2, model2, loader, news_loader, eval_loader)
    assert int(t2.state.step) == 10
    t2.train()
    assert int(t2.state.step) == 15


def test_trainer_preemption_checkpoints_and_resumes(setup):
    """SIGTERM mid-training → synchronous checkpoint at the next step
    boundary, clean return; --checkpoint -1 resumes from that newest
    checkpoint (the TPU maintenance-event story; the reference has no
    preemption handling)."""
    import signal
    import threading

    tmp, cfg, data, model = setup
    cfg = cfg.replace(encoderU="attn", step_budget=200, save_step=1000,
                      epochs=5,
                      ckpt_root=os.path.join(tmp, "ckpt_preempt"))
    model2 = build_model(cfg, data.vocab_size, data.user_num)
    loader = build_train_loader(cfg, data)
    t1 = Trainer(cfg, model2, loader)

    orig_step = t1.train_step
    fired = threading.Event()

    def step_then_signal(state, batch, rng):
        new_state, metrics = orig_step(state, batch, rng)
        if int(new_state.step) >= 3 and not fired.is_set():
            fired.set()
            signal.raise_signal(signal.SIGTERM)
        return new_state, metrics

    t1.train_step = step_then_signal
    result = t1.train()  # returns (no SystemExit) after checkpointing
    assert result == {}
    stopped_at = latest_step(cfg.ckpt_dir(), cfg.scale)
    assert stopped_at is not None and 3 <= stopped_at < 200

    cfg2 = cfg.replace(checkpoint=-1, step_budget=5)  # 5 more steps
    t2 = Trainer(cfg2, model2, loader)
    assert int(t2.state.step) == stopped_at
    t2.train()
    assert int(t2.state.step) == stopped_at + 5


def test_grad_norm_metric_is_opt_in(setup):
    """Per-step grad-norm costs a full gradient read; it must appear only
    with with_grad_norm=True (the reference logs no norms either)."""
    tmp, cfg, data, model = setup
    loader = build_train_loader(cfg, data)
    batch = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = make_optimizer(cfg.lr, cfg.bert_lr)
    mesh = make_mesh()
    rng = jax.random.PRNGKey(0)

    state = create_train_state(params, opt)
    _, m = make_train_step(model, opt, mesh=mesh, donate=False)(
        state, batch, rng)
    assert "grad_norm" not in m

    state = create_train_state(params, opt)
    _, m = make_train_step(model, opt, mesh=mesh, donate=False,
                           with_grad_norm=True)(state, batch, rng)
    assert float(m["grad_norm"]) > 0.0


def test_fused_optimizer_matches_reference():
    """CLAUDE.md exactness bar for the fused-Adam restructuring:
    make_fused_optimizer (update() path AND fused_apply path) must
    produce the SAME parameters as per-leaf optax make_optimizer over
    multiple steps, for both LR groups and with the linear warmup
    schedule."""
    from news_recommendation_mind_tpu.train.state import (
        make_fused_optimizer, make_optimizer,
    )
    rng = np.random.default_rng(0)

    def tree():
        return {
            "embedding": {"w": jnp.asarray(
                rng.standard_normal((17, 5)), jnp.float32)},
            "bert_encoder": {"layer_0": {"k": jnp.asarray(
                rng.standard_normal((4, 9)), jnp.float32)},
                "bias": jnp.asarray(rng.standard_normal(9), jnp.float32)},
            "head": jnp.asarray(rng.standard_normal((3,)), jnp.float32),
        }

    for scheduler in ("none", "linear"):
        params_a = tree()
        params_b = jax.tree_util.tree_map(jnp.array, params_a)
        opt_a = make_optimizer(1e-2, 3e-4, scheduler=scheduler, warmup=3,
                               total_steps=10)
        opt_b = make_fused_optimizer(1e-2, 3e-4, scheduler=scheduler,
                                     warmup=3, total_steps=10)
        sa, sb = opt_a.init(params_a), opt_b.init(params_b)
        for step in range(6):
            grads = jax.tree_util.tree_map(
                lambda p: jnp.asarray(
                    rng.standard_normal(p.shape), jnp.float32), params_a)
            ua, sa = opt_a.update(grads, sa, params_a)
            ub, sb = opt_b.update(grads, sb, params_b)
            import optax as _optax
            params_a = _optax.apply_updates(params_a, ua)
            params_b = _optax.apply_updates(params_b, ub)
            for a, b in zip(jax.tree_util.tree_leaves(params_a),
                            jax.tree_util.tree_leaves(params_b)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
                    err_msg=f"scheduler={scheduler} step={step}")
