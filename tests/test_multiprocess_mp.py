"""Cross-process MODEL parallelism on real two-process jax.distributed.

The round-4 composition gap (VERDICT missing #3): the row-sharded word
table was proven on an 8-virtual-device mesh inside ONE process, and
real multi-process was proven for pure dp — but a dp x mp mesh whose
'model' axis SPANS processes (SURVEY §2.5's genuinely multi-host TP
configuration) had no test. Here two jax.distributed processes with 4
virtual CPU devices each build a (data=4, model=2) mesh arranged so
every model group holds one device from EACH process — the sharded
embedding's lookup psum and the gradient scatter-add therefore cross
the process boundary — run sharded train steps through the Trainer
path, and the losses must match a single-process run of the identical
dp x mp layout.

Step budget kept small per the 53fbc03 philosophy: the scenario under
test is the cross-process model-axis collectives, not soak coverage —
every extra sharded step on this XLA:CPU+Gloo stack re-opens the
known load-sensitive rendezvous window (ARCHITECTURE.md).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import faulthandler, json, os, sys
faulthandler.dump_traceback_later(900, exit=True)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from news_recommendation_mind_tpu.config import Config
from news_recommendation_mind_tpu.experiment import (
    build_data, build_eval_loaders, build_model, build_train_loader,
)
from news_recommendation_mind_tpu.train import Trainer

root = sys.argv[3]
cfg = Config(scale="synthetic", data_root=os.path.join(root, "data"),
             cache_root=os.path.join(root, "cache"),
             ckpt_root=os.path.join(root, "ckpt"), batch_size=8,
             his_size=10, signal_length=12, hidden_dim=32,
             embedding_dim=32, head_num=4, dtype="float32", seed=7,
             model_parallel=2, device_gather=False,
             # no persistent compile cache in XLA:CPU distributed
             # workers (the AOT cache-load wedge, ARCHITECTURE.md)
             compile_cache=False)
pidx = jax.process_index()
data = build_data(cfg, process_index=pidx)

# (data=4, model=2) grid from the 8 global devices, transposed so each
# model PAIR holds one device from each process — the thing under test
devs = np.array(jax.devices())
assert len(devs) == 8, len(devs)
grid = devs.reshape(2, 4).T
for row in grid:
    assert {d.process_index for d in row} == {0, 1}, row
mesh = Mesh(grid, ("data", "model"))

model = build_model(cfg, data.vocab_size, data.user_num, mesh=mesh)
from news_recommendation_mind_tpu.parallel import ShardedWordEmbedding
assert isinstance(model.embedding, ShardedWordEmbedding)

# UNsharded loader: the model axis spans processes, so each process's
# devices cover every data row — both processes iterate the identical
# batch stream (deterministic per (seed, epoch)) and serve their
# addressable shards from the full host arrays
loader = build_train_loader(cfg, data)
news_loader, eval_loader = build_eval_loaders(cfg, data, "dev")
trainer = Trainer(cfg, model, loader, news_loader, eval_loader,
                  mesh=mesh)
spec = trainer.state.params["params"]["embedding"]["embedding"] \
    .sharding.spec
assert tuple(spec) == ("model", None), spec

def to_global(batch):
    sh = NamedSharding(mesh, P("data"))
    return {k: jax.make_array_from_callback(
        v.shape, sh, lambda idx, v=v: v[idx]) for k, v in batch.items()}

it = iter(loader)
losses = []
state = trainer.state
for _ in range(4):
    state, m = trainer.train_step(state, to_global(next(it)),
                                  trainer.rng)
    losses.append(float(m["loss"]))
assert all(np.isfinite(l) for l in losses), losses
# state stays on its model shards across steps
spec2 = state.params["params"]["embedding"]["embedding"].sharding.spec
assert tuple(spec2) == ("model", None), spec2
if pidx == 0:
    with open(os.path.join(root, "losses.json"), "w") as f:
        json.dump(losses, f)
print("process", pidx, "cross-process mp losses", losses)
# align both workers before interpreter exit: under heavy host load the
# completion skew between workers can exceed the coordination service's
# shutdown-barrier timeout (observed once with a device benchmark
# saturating both cores during the suite), which turns a clean finish
# into a DEADLINE_EXCEEDED shutdown failure
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("worker_done")
faulthandler.cancel_dump_traceback_later()
"""


@pytest.mark.slow
def test_two_process_model_parallel(tmp_path):
    root = str(tmp_path)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker_path = os.path.join(root, "worker.py")
    with open(worker_path, "w") as f:
        f.write(WORKER)

    env = dict(os.environ)
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                        "--xla_cpu_collective_call_terminate_timeout_seconds=600 "
                        "--xla_cpu_collective_call_warn_stuck_timeout_seconds=60")
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)   # the AOT wedge, see WORKER
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, worker_path, coord, str(i), root],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = ["<no output captured: worker timed out>"] * len(procs)
    try:
        # hang detector, not a latency bound (cold compiles on half of a
        # 2-core host are legitimately slow; see test_multiprocess.py)
        outs = [p.communicate(timeout=2400)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, "\n=== worker outputs ===\n".join(
            o[-3000:] for o in outs)
    with open(os.path.join(root, "losses.json")) as f:
        dist_losses = json.load(f)

    # single-process reference: the IDENTICAL dp x mp layout on this
    # process's 8 virtual devices (same transposed grid, same seed)
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from news_recommendation_mind_tpu.config import Config
    from news_recommendation_mind_tpu.experiment import (
        build_data, build_eval_loaders, build_model, build_train_loader,
    )
    from news_recommendation_mind_tpu.train import Trainer
    cfg = Config(scale="synthetic", data_root=os.path.join(root, "data"),
                 cache_root=os.path.join(root, "cache"),
                 ckpt_root=os.path.join(root, "ckpt2"), batch_size=8,
                 his_size=10, signal_length=12, hidden_dim=32,
                 embedding_dim=32, head_num=4, dtype="float32", seed=7,
                 model_parallel=2, device_gather=False)
    data = build_data(cfg)
    grid = np.array(jax.devices()[:8]).reshape(2, 4).T
    mesh = Mesh(grid, ("data", "model"))
    model = build_model(cfg, data.vocab_size, data.user_num, mesh=mesh)
    loader = build_train_loader(cfg, data)
    news_loader, eval_loader = build_eval_loaders(cfg, data, "dev")
    trainer = Trainer(cfg, model, loader, news_loader, eval_loader,
                      mesh=mesh)

    def to_global(batch):
        sh = NamedSharding(mesh, P("data"))
        return {k: jax.device_put(v, sh) for k, v in batch.items()}

    it = iter(loader)
    state = trainer.state
    ref_losses = []
    for _ in range(4):
        state, m = trainer.train_step(state, to_global(next(it)),
                                      trainer.rng)
        ref_losses.append(float(m["loss"]))
    np.testing.assert_allclose(dist_losses, ref_losses, rtol=0,
                               atol=1e-6)
