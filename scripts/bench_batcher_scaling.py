"""Host batcher throughput vs OMP thread count (round-4 VERDICT weak #2).

The at-scale PLM rehearsal showed 627 ex/s e2e vs 1,291 ex/s device —
the host dedup batcher on this machine's 2 cores is the gap — and the
round-4 claim "at production host:chip ratios the loader threads scale
out" was untested. This bench measures the native batcher's assembly
rate (ids-only + dedup, the PLM/two-tower dedup mode, and the
token-emitting mode) at OMP_NUM_THREADS=1/2/4 on the synthetic corpus,
plus the dedup step alone (native mark-array vs per-batch np.unique).

Each thread count runs in a fresh subprocess (OpenMP reads the env once).
Usage: python scripts/bench_batcher_scaling.py [--child N]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child(threads: int) -> dict:
    env = dict(os.environ, OMP_NUM_THREADS=str(threads),
               JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         str(threads)],
        capture_output=True, text=True, env=env, timeout=900)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def child(threads: int) -> None:
    import numpy as np

    from news_recommendation_mind_tpu.config import Config
    from news_recommendation_mind_tpu.experiment import (
        build_data, build_train_loader)

    cfg = Config(scale="synthetic", data_root=os.path.join(ROOT, "data_big"),
                 cache_root=os.path.join(ROOT, "data_big", "cache"),
                 batch_size=128, npratio=4, his_size=50, signal_length=30,
                 embedding="bert", bert="newsbert", model="plm",
                 device_gather=True, dedup_news=True)
    data = build_data(cfg, splits=("train",))
    loader = build_train_loader(cfg, data)
    assert loader.backend == "native", loader.backend

    def rate(emit_tokens: bool, dedup: bool, n_batches: int = 200):
        loader.emit_tokens = emit_tokens
        loader.dedup = dedup
        it = iter(loader)
        next(it)                                  # warm
        t0 = time.perf_counter()
        n = 0
        for _ in range(n_batches):
            b = next(it)
            n += len(b["label"])
        return n / (time.perf_counter() - t0)

    res = {
        "threads": threads,
        "ids_dedup_ex_s": round(rate(False, True)),
        "ids_only_ex_s": round(rate(False, False)),
        "tokens_ex_s": round(rate(True, False)),
    }

    # dedup step alone: native vs numpy at the same batches
    loader.emit_tokens = False
    loader.dedup = False
    batches = []
    it = iter(loader)
    for _ in range(100):
        batches.append(next(it))
    t0 = time.perf_counter()
    for b in batches:
        loader._native.dedup_batch(b["cdd_id"], b["his_id"],
                                   loader.u_pad, loader.u_quantum)
    res["dedup_native_us_per_batch"] = round(
        (time.perf_counter() - t0) / len(batches) * 1e6)
    t0 = time.perf_counter()
    for b in batches:
        ids = np.concatenate([b["cdd_id"].ravel(), b["his_id"].ravel()])
        np.unique(ids, return_inverse=True)
    res["dedup_numpy_us_per_batch"] = round(
        (time.perf_counter() - t0) / len(batches) * 1e6)
    print(json.dumps(res))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    for t in (1, 2, 4):
        print(json.dumps(run_child(t)))


if __name__ == "__main__":
    main()
