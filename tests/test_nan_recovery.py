"""Failure recovery: Trainer restores a checkpoint on non-finite loss."""
import os

import numpy as np
import pytest

from news_recommendation_mind_tpu.config import Config
from news_recommendation_mind_tpu.experiment import (
    build_data, build_eval_loaders, build_model, build_train_loader,
)
from news_recommendation_mind_tpu.train import Trainer


def _cfg(tmp, **kw):
    base = dict(scale="synthetic", data_root=os.path.join(tmp, "data"),
                cache_root=os.path.join(tmp, "cache"),
                ckpt_root=os.path.join(tmp, "ckpt"),
                result_root=os.path.join(tmp, "results"),
                batch_size=16, his_size=10, signal_length=12,
                hidden_dim=32, embedding_dim=32, head_num=4, epochs=1,
                dtype="float32", encoderU="attn", interval=1,
                device_gather=False,
                mesh_shape=(1,))  # recovery logic, not sharding, under test
    base.update(kw)
    return Config(**base)


def _poisoned_trainer(tmp, nan_recover):
    # an absurd lr drives the loss to NaN within a few steps
    cfg = _cfg(tmp, lr=1e10, nan_recover=nan_recover, step_budget=40,
               save_step=5)
    data = build_data(cfg)
    model = build_model(cfg, data.vocab_size, data.user_num)
    loader = build_train_loader(cfg, data)
    news_loader, eval_loader = build_eval_loaders(cfg, data)
    return Trainer(cfg, model, loader, news_loader, eval_loader)


def test_nan_fails_fast_by_default(tmp_path):
    trainer = _poisoned_trainer(str(tmp_path), nan_recover=0)
    with pytest.raises(FloatingPointError, match="non-finite"):
        trainer.train()


def test_nan_recovers_then_gives_up(tmp_path):
    from news_recommendation_mind_tpu.train import save_checkpoint
    trainer = _poisoned_trainer(str(tmp_path), nan_recover=2)
    # a known-good step-0 checkpoint exists (as it would mid-run)
    save_checkpoint(trainer.cfg.ckpt_dir(), trainer.cfg.scale,
                    trainer.state)
    with pytest.raises(FloatingPointError):
        trainer.train()
    # it actually attempted the bounded number of restores before failing
    assert trainer.nan_recoveries == 3
