"""Floor ledger for the PLM (newsbert) train step (round-3 VERDICT
weak #2): trace N steps with jax.profiler, parse the xplane, bucket
device time by op family, and compare each bucket against its
first-principles floor (MXU FLOPs at the v5e bf16 peak, HBM bytes at
the measured ~270 GB/s streaming rate).

Shapes match bench.bench_newsbert (bs=128, U=2048 uniques, S=30, H=768,
4 layers, FFN 3072, bf16, fused kernels + fused Adam).

Usage: python scripts/ledger_newsbert.py [--trace-dir /tmp/nb_trace]
Prints one JSON line per bucket and a summary.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e single-chip peaks (public spec; bandwidth = this repo's measured
# streaming rate from the round-2/3 microbenchmarks, BASELINE.md)
PEAK_BF16_TFLOPS = 197.0
HBM_GBPS = 270.0

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


def parse_xplane(trace_dir: str):
    """Sum device-plane event durations by event name → {name: us}."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with open(path, "rb") as f:
        space = xplane_pb2.XSpace.FromString(f.read())
    totals = defaultdict(float)
    for plane in space.planes:
        name = plane.name.lower()
        if "tpu" not in name and "device" not in name:
            continue
        if "host" in name or "sparsecore" in name:
            continue
        ev_names = dict(plane.event_metadata)
        for line in plane.lines:
            ln = line.name.lower()
            # XLA op lines carry per-op events; skip step/module summary
            # lines so time is not double counted
            if ln.startswith("step") or "module" in ln:
                continue
            for ev in line.events:
                meta = ev_names.get(ev.metadata_id)
                nm = meta.name if meta else str(ev.metadata_id)
                totals[nm] += ev.duration_ps / 1e6  # ps → us
    return totals


BUCKETS = (
    ("pallas_mhsa", ("mhsa",)),
    ("pallas_ln_dropout", ("add_ln", "_ln_", "ln_fwd", "ln_bwd")),
    ("pallas_adam", ("adam",)),
    ("pallas_lstm", ("lstm",)),
    ("weight_grad_matmul", ()),         # filled by dot classification
    ("fwd_dgrad_matmul", ()),
    ("embedding_gather_scatter", ("gather", "scatter", "dynamic")),
    ("elementwise_fusions", ("fusion", "select", "convert", "copy",
                             "transpose", "broadcast", "reduce",
                             "bitcast")),
    ("other", ()),
)


def classify(name: str) -> str:
    n = name.lower()
    for key in ("mhsa",):
        if key in n:
            return "pallas_mhsa"
    if "add_ln" in n or "tpu_custom_call" in n and "ln" in n:
        return "pallas_ln_dropout"
    if "adam" in n:
        return "pallas_adam"
    if "custom-call" in n or "custom_call" in n:
        return "pallas_other"
    if n.startswith("%dot") or ".dot" in n or n.startswith("dot"):
        # weight grads contract over the token axis (61440) → their
        # output is [H, H] / [H, FFN]; XLA names don't expose shapes
        # here, so dots are split later by metadata when available
        return "dot"
    if any(k in n for k in ("gather", "scatter", "dynamic-update")):
        return "embedding_gather_scatter"
    if any(k in n for k in ("fusion", "select", "convert", "copy",
                            "transpose", "broadcast", "reduce",
                            "bitcast", "add", "multiply")):
        return "elementwise_fusions"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/nb_ledger_trace")
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()
    step_ms, steps = run_and_trace(args.trace_dir, args.steps)

    totals = parse_xplane(args.trace_dir)
    buckets = defaultdict(float)
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
    for name, us in totals.items():
        buckets[classify(name)] += us
    per_step = {k: round(v / steps / 1e3, 2) for k, v in buckets.items()}

    # ---- first-principles floors (ms/step) ----
    tokens = U * S
    mm_macs_tok = 4 * H * H + 2 * H * FFN          # qkv+out + ffn
    fwd_flops = tokens * mm_macs_tok * 2 * LAYERS
    floors = {
        "fwd_matmul": fwd_flops / (PEAK_BF16_TFLOPS * 1e9),
        "dgrad_matmul": fwd_flops / (PEAK_BF16_TFLOPS * 1e9),
        "wgrad_matmul": fwd_flops / (PEAK_BF16_TFLOPS * 1e9),
        # LN family HBM bytes: 2 LN/layer, fwd reads x+res writes y
        # (3 streams), bwd reads dy,x,res writes dx,dres (5) → 8 × bf16
        "ln_dropout_hbm": (tokens * H * 2 * 8 * 2 * LAYERS
                           / (HBM_GBPS * 1e6)),
        # Adam: 7 f32 streams over ~52.8M params
        "adam_hbm": 52.8e6 * 4 * 7 / (HBM_GBPS * 1e6),
    }
    print(json.dumps({"bench": "buckets_ms_per_step", **per_step}),
          flush=True)
    print(json.dumps({"bench": "floors_ms", **{k: round(v, 2)
                      for k, v in floors.items()}}), flush=True)
    print(json.dumps({"bench": "top_ops_us_per_step", "ops": [
        [n[:90], round(us / steps, 1)] for n, us in top[:25]]}),
          flush=True)
    print(json.dumps({
        "bench": "summary",
        "step_ms": round(step_ms, 1),
        "device_total_ms": round(sum(buckets.values()) / steps / 1e3, 1),
        "matmul_floor_ms": round(floors["fwd_matmul"]
                                 + floors["dgrad_matmul"]
                                 + floors["wgrad_matmul"], 1),
        "mxu_pct_of_step": round(100 * (floors["fwd_matmul"]
                                        + floors["dgrad_matmul"]
                                        + floors["wgrad_matmul"])
                                 / step_ms, 1)}), flush=True)


if __name__ == "__main__":
    main()
