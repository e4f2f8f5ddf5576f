"""Serving-latency benchmark (BASELINE.md serving section).

Trains a quick two-tower on the synthetic corpus (or reuses its
checkpoint), builds `serving.Recommender`, and measures per-request
latency percentiles on the CURRENT kernel substrate — re-run after any
hot-path change (round-3 VERDICT weak #6: the serving numbers must not
lag the kernels the scorer jits).

Prints one JSON line per measurement. Usage:
    python scripts/bench_serving.py [--requests 200]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_ROOT = os.path.join(ROOT, "data_serving_bench")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--history", type=int, default=20)
    ap.add_argument("--candidates", type=int, default=8)
    args = ap.parse_args()

    from news_recommendation_mind_tpu.config import Config
    from news_recommendation_mind_tpu.experiment import (
        build_data, build_eval_loaders, build_model, build_train_loader,
    )
    from news_recommendation_mind_tpu.serving import Recommender
    from news_recommendation_mind_tpu.train import Trainer
    from news_recommendation_mind_tpu.train.checkpoint import latest_step

    cfg = Config(scale="synthetic", data_root=os.path.join(DATA_ROOT, "data"),
                 cache_root=os.path.join(DATA_ROOT, "cache"),
                 ckpt_root=os.path.join(DATA_ROOT, "ckpt"),
                 result_root=os.path.join(DATA_ROOT, "results"),
                 batch_size=512, his_size=50, signal_length=30,
                 hidden_dim=150, embedding_dim=768, head_num=12,
                 epochs=1, dtype="bfloat16", interval=1000)
    data = build_data(cfg)
    if latest_step(cfg.ckpt_dir(), cfg.scale) is None:
        model = build_model(cfg, data.vocab_size, data.user_num)
        loader = build_train_loader(cfg, data)
        news_loader, eval_loader = build_eval_loaders(cfg, data)
        t0 = time.perf_counter()
        Trainer(cfg, model, loader, news_loader, eval_loader).train()
        print(json.dumps({"stage": "train_checkpoint",
                          "seconds": round(time.perf_counter() - t0, 1)}),
              flush=True)

    t0 = time.perf_counter()
    rec = Recommender(cfg)
    cold = time.perf_counter() - t0
    print(json.dumps({"stage": "recommender_init_and_table_encode",
                      "seconds": round(cold, 1),
                      "articles": int(rec.table.shape[0]) - 1}), flush=True)

    rng = np.random.default_rng(0)
    all_nids = [rec.idx2nid[i] for i in range(1, rec.table.shape[0])]

    def request():
        hist = list(rng.choice(all_nids, size=args.history, replace=False))
        cand = list(rng.choice(all_nids, size=args.candidates,
                               replace=False))
        return hist, cand

    # warmup: one request per bucket the scorer will compile
    for _ in range(5):
        h, c = request()
        rec.rank(h, c)
    lat = []
    for _ in range(args.requests):
        h, c = request()
        t0 = time.perf_counter()
        rec.rank(h, c)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    print(json.dumps({
        "stage": "rank_latency_ms", "requests": args.requests,
        "candidates": args.candidates, "history": args.history,
        "p50": round(float(np.percentile(lat, 50)), 1),
        "p90": round(float(np.percentile(lat, 90)), 1),
        "p99": round(float(np.percentile(lat, 99)), 1),
        "mean": round(float(lat.mean()), 1)}), flush=True)

    # retrieval over the whole corpus (candidate generation)
    for _ in range(3):
        h, _ = request()
        rec.retrieve(h, k=10)
    lat = []
    for _ in range(args.requests // 2):
        h, _ = request()
        t0 = time.perf_counter()
        rec.retrieve(h, k=10)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    print(json.dumps({
        "stage": "retrieve_latency_ms", "k": 10,
        "corpus": len(all_nids),
        "p50": round(float(np.percentile(lat, 50)), 1),
        "p99": round(float(np.percentile(lat, 99)), 1)}), flush=True)


if __name__ == "__main__":
    main()
