"""Floor ledger for the XFormer (longformer S=1024) train step.

Same methodology as scripts/ledger_newsbert.py (xprof op_profile
self-time attribution + first-principles matmul-FLOP floor): trace N
steps of bench.bench_xformer's exact shapes (bs=32, 12 layers, H=768,
FFN 3072, window-32 banded Pallas attention, bf16, fused kernels) and
bucket where the ~237 ms step goes. The long-context family is the
reference's flagship for S≫30 (reference models/XFormer.py:78-99), so
its step deserves the same speed-of-light accounting the newsbert step
got in round 4.

Usage: python scripts/ledger_xformer.py [--trace-dir /tmp/xf_trace]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ledger_newsbert import op_profile  # noqa: E402  (same trace parser)

PEAK_BF16_TFLOPS = 197.0

BS, CDD, HIS, SIGNAL, VOCAB = 32, 5, 50, 30, 30522
H, FFN, LAYERS, S_USER = 768, 3072, 12, 1024


def run_and_trace(trace_dir: str, steps: int = 12):
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "cache", "jax_compile")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from news_recommendation_mind_tpu.models.bert import (
        BertModel, bert_variant,
    )
    from news_recommendation_mind_tpu.models.xformer import XFormer
    from news_recommendation_mind_tpu.parallel import make_mesh
    from news_recommendation_mind_tpu.train import (
        create_train_state, make_fused_optimizer, make_train_step,
    )
    jax.config.update("jax_default_prng_impl", "rbg")
    mesh = make_mesh()
    variant = bert_variant("longformer", vocab_size=VOCAB,
                           signal_length=SIGNAL)
    model = XFormer(bert=BertModel(variant, dtype=jnp.bfloat16),
                    hidden_dim=variant.hidden_size,
                    max_length=variant.max_length,
                    max_length_per_history=variant.max_length_per_history)
    rng = np.random.default_rng(0)
    batch = {
        "cdd_token": rng.integers(
            1, VOCAB, (BS, CDD, SIGNAL)).astype(np.int32),
        "cdd_attn": np.ones((BS, CDD, SIGNAL), np.float32),
        "his_token": rng.integers(
            1, VOCAB, (BS, HIS, SIGNAL)).astype(np.int32),
        "his_attn": np.ones((BS, HIS, SIGNAL), np.float32),
        "his_mask": np.ones((BS, HIS), np.float32),
        "cdd_mask": np.ones((BS, CDD), np.float32),
        "label": np.zeros(BS, np.int32),
        "user_id": rng.integers(0, 1000, BS).astype(np.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)
    opt = make_fused_optimizer(1e-4, 6e-6)
    state = create_train_state(params, opt)
    step = make_train_step(model, opt, mesh=mesh, donate=True)
    key = jax.random.PRNGKey(0)
    for _ in range(4):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])
    jax.profiler.stop_trace()
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(json.dumps({"bench": "traced_step_ms", "ms": round(dt, 1),
                      "steps": steps}), flush=True)
    return dt, steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/xf_ledger_trace")
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()
    step_ms, steps = run_and_trace(args.trace_dir, args.steps)
    dev_ms, mxu, hbm, rows = op_profile(args.trace_dir, args.steps)
    for ms, name, subs in rows:
        if ms < 0.05:
            continue
        print(json.dumps({"bench": "category_ms_per_step",
                          "category": name, "ms": round(ms, 2),
                          "top": [[n[:60], round(m, 2)]
                                  for m, n in subs[:3]]}), flush=True)

    # matmul-FLOP floor: user tokens (BS*S_USER) + candidate tokens
    # (BS*CDD*SIGNAL) through 12 layers of qkv+out (4·H²) + FFN (2·H·FFN)
    tokens = BS * S_USER + BS * CDD * SIGNAL
    mm_macs_tok = 4 * H * H + 2 * H * FFN
    fwd = tokens * mm_macs_tok * 2 * LAYERS
    floor = 3 * fwd / (PEAK_BF16_TFLOPS * 1e9)
    print(json.dumps({
        "bench": "summary",
        "traced_step_wall_ms": round(step_ms, 1),
        "device_busy_ms_per_step": round(dev_ms, 1),
        "mxu_flops_fraction": round(mxu, 3),
        "hbm_bw_fraction": round(hbm, 3),
        "matmul_flop_floor_ms": round(floor, 1)}), flush=True)


if __name__ == "__main__":
    main()
