"""Floor ledger for the PLM (newsbert) train step (round-3 VERDICT
weak #2): trace N steps with jax.profiler, attribute device time with
xprof's op_profile converter (proper self-time; naive per-event sums
double-count async spans), and compare against the composite matmul
FLOP floor at the v5e bf16 peak. The per-bucket floor analysis derived
from this output lives in BASELINE.md ("round-4 newsbert floor
ledger").

Shapes match bench.bench_newsbert (bs=128, U=2048 uniques, S=30, H=768,
4 layers, FFN 3072, bf16, fused kernels + fused Adam).

Usage: python scripts/ledger_newsbert.py [--trace-dir /tmp/nb_trace]
Prints one JSON line per bucket and a summary.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_TFLOPS = 197.0   # v5e single-chip public spec

BS, U, S, H, LAYERS, FFN = 128, 2048, 30, 768, 4, 3072
HIS = 50


def run_and_trace(trace_dir: str, steps: int = 12):
    import jax

    import bench
    from news_recommendation_mind_tpu.parallel import make_mesh
    jax.config.update("jax_default_prng_impl", "rbg")
    mesh = make_mesh()
    # reuse the bench harness but wrap a trace window around hot steps
    import jax.numpy as jnp

    from news_recommendation_mind_tpu.models import make_user_encoder
    from news_recommendation_mind_tpu.models.bert import (
        BertModel, bert_variant,
    )
    from news_recommendation_mind_tpu.models.plm import PLM
    from news_recommendation_mind_tpu.models.two_tower import (
        forward_from_unique,
    )
    from news_recommendation_mind_tpu.train import (
        create_train_state, make_fused_optimizer, make_train_step,
    )
    rng = np.random.default_rng(0)
    batch = {
        "uniq_token": rng.integers(1, 30522, (U, S)).astype(np.int32),
        "uniq_attn": np.ones((U, S), np.float32),
        "cdd_pos": rng.integers(0, U, (BS, 5)).astype(np.int32),
        "his_pos": rng.integers(0, U, (BS, HIS)).astype(np.int32),
        "his_mask": np.ones((BS, HIS), np.float32),
        "cdd_mask": np.ones((BS, 5), np.float32),
        "label": np.zeros(BS, np.int32),
        "user_id": rng.integers(0, 1000, BS).astype(np.int32),
    }
    variant = bert_variant("newsbert", vocab_size=30522, signal_length=S)
    model = PLM(bert=BertModel(variant, dtype=jnp.bfloat16),
                user_encoder=make_user_encoder("attn", hidden_dim=H,
                                               head_num=12,
                                               dtype=jnp.bfloat16),
                hidden_dim=H)
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        batch, False, method=forward_from_unique)
    opt = make_fused_optimizer(1e-4, 6e-6)
    state = create_train_state(params, opt)
    n_news = 30_000
    table = (rng.integers(1, 30522, (n_news + 1, S)).astype(np.int32),
             np.ones((n_news + 1, S), np.float32))
    dedup_batch = {
        "uniq_id": rng.integers(1, n_news, U).astype(np.int32),
        "cdd_pos": batch["cdd_pos"], "his_pos": batch["his_pos"],
        "his_mask": batch["his_mask"], "cdd_mask": batch["cdd_mask"],
        "label": batch["label"], "user_id": batch["user_id"],
    }
    step = make_train_step(model, opt, mesh=mesh, donate=True,
                           news_table=table)
    key = jax.random.PRNGKey(0)
    for _ in range(4):
        state, metrics = step(state, dedup_batch, key)
    float(metrics["loss"])
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        state, metrics = step(state, dedup_batch, key)
    float(metrics["loss"])
    jax.profiler.stop_trace()
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(json.dumps({"bench": "traced_step_ms", "ms": round(dt, 1),
                      "steps": steps}), flush=True)
    return dt, steps


def op_profile(trace_dir: str, steps: int):
    """Parse the trace with xprof's op_profile converter (proper
    self-time attribution; the naive per-event sum double-counts async
    spans). Returns (device_ms_per_step, mxu_fraction, hbm_fraction,
    category rows)."""
    from xprof.convert import raw_to_tool_data as rtd
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    # newest session only — passing several sessions' xplanes at once
    # makes the converter bail (returns None)
    paths = [max(paths, key=os.path.getmtime)]
    out, _ = rtd.xspace_to_tool_data(paths, "op_profile", {})
    assert out is not None, "op_profile conversion failed"
    data = json.loads(out.decode())
    prog = data["byProgramExcludeIdle"]["children"][0]
    total_ps = prog["metrics"]["rawTime"]
    rows = []
    for cat in prog["children"]:
        m = cat["metrics"]
        subs = [(c["metrics"]["rawTime"] / 1e9 / steps, c["name"])
                for c in sorted(cat.get("children", []),
                                key=lambda c: -c["metrics"]["rawTime"])[:4]]
        rows.append((m["rawTime"] / 1e9 / steps, cat["name"], subs))
    rows.sort(reverse=True)
    return (total_ps / 1e9 / steps, prog["metrics"]["flops"],
            prog["metrics"]["bandwidthUtils"][0], rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/nb_ledger_trace")
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

    # ---- first-principles floors (ms/step) ----
    tokens = U * S
    mm_macs_tok = 4 * H * H + 2 * H * FFN          # qkv+out + ffn
    fwd_flops = tokens * mm_macs_tok * 2 * LAYERS
    matmul_floor = 3 * fwd_flops / (PEAK_BF16_TFLOPS * 1e9)  # fwd+dgrad+wgrad
    print(json.dumps({
        "bench": "summary",
        "traced_step_wall_ms": round(step_ms, 1),
        "device_busy_ms_per_step": round(dev_ms, 1),
        "mxu_flops_fraction": round(mxu, 3),
        "hbm_bw_fraction": round(hbm, 3),
        "matmul_flop_floor_ms": round(matmul_floor, 1)}), flush=True)


if __name__ == "__main__":
    main()
