"""--model-parallel through the full Trainer path on the 8-device mesh.

dryrun-style dp x mp layout (row-sharded word table via shard_map,
towers data-parallel), but wired through Config -> mesh_from_config ->
build_model -> Trainer, i.e. what `--model-parallel 2` actually runs.
"""
import os

import jax
import numpy as np
import pytest

from news_recommendation_mind_tpu.config import Config
from news_recommendation_mind_tpu.experiment import (
    build_data, build_eval_loaders, build_model, build_train_loader,
)
from news_recommendation_mind_tpu.parallel.mesh import mesh_from_config
from news_recommendation_mind_tpu.train import Trainer


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_trainer_model_parallel(tmp_path):
    tmp = str(tmp_path)
    cfg = Config(
        scale="synthetic", data_root=os.path.join(tmp, "data"),
        cache_root=os.path.join(tmp, "cache"),
        ckpt_root=os.path.join(tmp, "ckpt"),
        result_root=os.path.join(tmp, "results"),
        batch_size=16, his_size=6, signal_length=10, hidden_dim=32,
        embedding_dim=32, head_num=4, epochs=1, dtype="float32",
        interval=1000, save_step=10 ** 6, model_parallel=2,
        device_gather=False)
    mesh = mesh_from_config(cfg)
    assert mesh.shape["model"] == 2
    data = build_data(cfg)
    model = build_model(cfg, data.vocab_size, data.user_num, mesh=mesh)
    # the sharded-embedding module, not the fused or plain table
    from news_recommendation_mind_tpu.parallel import ShardedWordEmbedding
    assert isinstance(model.embedding, ShardedWordEmbedding)
    loader = build_train_loader(cfg, data)
    news_loader, eval_loader = build_eval_loaders(cfg, data, "dev")
    trainer = Trainer(cfg, model, loader, news_loader, eval_loader,
                      mesh=mesh)
    # table + its Adam moments actually live on 'model' shards
    spec = trainer.state.params["params"]["embedding"]["embedding"] \
        .sharding.spec
    assert tuple(spec) == ("model", None)
    batch = next(iter(loader))
    from news_recommendation_mind_tpu.parallel import shard_batch
    state, metrics = trainer.train_step(
        trainer.state, shard_batch(batch, mesh), trainer.rng)
    assert np.isfinite(float(metrics["loss"]))
    # output state keeps the sharded layout (no replicated roundtrip)
    spec2 = state.params["params"]["embedding"]["embedding"].sharding.spec
    assert tuple(spec2) == ("model", None)
