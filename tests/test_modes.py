"""CLI mode dispatch integration: analyse / recall / inspect / encode.

The reference declares analyse, recall and a working inspect but never
implements their handlers (utils/Manager.py:45; plm.py:48 calls an
undefined method); here each must work end-to-end on synthetic data.
"""
import os

import numpy as np
import pytest

from news_recommendation_mind_tpu.cli.common import run
from news_recommendation_mind_tpu.config import Config


@pytest.fixture(scope="module")
def base_cfg(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("modes"))
    def make(**kw):
        base = dict(
            scale="synthetic", data_root=os.path.join(tmp, "data"),
            cache_root=os.path.join(tmp, "cache"),
            ckpt_root=os.path.join(tmp, "ckpt"),
            result_root=os.path.join(tmp, "results"),
            batch_size=16, his_size=6, signal_length=10, hidden_dim=32,
            embedding_dim=32, head_num=4, epochs=1, dtype="float32",
            interval=1000, device_gather=False,
            mesh_shape=(1,))  # mode dispatch, not sharding, under test
        base.update(kw)
        return Config(**base)
    return make


def test_analyse_mode(base_cfg):
    stats = run(base_cfg(mode="analyse"))
    assert stats["avg_title_length"] > 0
    assert stats["avg_his_length"] > 0


def test_recall_mode(base_cfg):
    result = run(base_cfg(mode="recall"))
    assert set(result) == {"recall@20", "recall@50", "recall@100"}
    # BM25 over the learnable topic signal must beat random-k/N recall
    assert result["recall@100"] > 100.0 / 400 * 1.2
    assert result["recall@20"] <= result["recall@50"] <= result["recall@100"]


def test_inspect_mode(base_cfg, capsys):
    result = run(base_cfg(mode="inspect"))
    assert result["n_params"] > 0
    out = capsys.readouterr().out
    assert "parameters:" in out and "sample 0" in out


def test_encode_mode(base_cfg):
    result = run(base_cfg(mode="encode"))
    assert result["users_per_s"] > 0


def test_encode_mode_checkpoint_latest(base_cfg):
    """-m encode --checkpoint -1 loads the newest checkpoint (the CLI
    counterpart of the Trainer's preemption-resume semantics)."""
    cfg = base_cfg(mode="train", step_budget=3, save_step=3)
    run(cfg)
    result = run(cfg.replace(mode="encode", checkpoint=-1))
    assert result["users_per_s"] > 0
