"""Measure the one-tower unique-user eval sweep (phase 1.5) on the TPU.

The reference's XFormer eval re-runs the full long-context PLM user pass
for every impression chunk (reference models/XFormer.py:91-95 via
utils/Manager.py:514-517) even though a MIND user's history is fixed
across their impressions. `engine.encode_unique_users` encodes each
distinct (user, history) once and phase 2 becomes lookups on both sides.

This benchmark builds a mid-size corpus at a real-MIND-like
impressions-per-user ratio (MINDlarge dev: ~365k impressions over ~255k
distinct users, ~1.43 impr/user → ~30% fewer user passes) and times the
FULL dev fast-eval phase 2 with the live per-chunk path vs the dedup
path on the real chip, asserting metric equality. One JSON line per leg.

Usage: python scripts/bench_user_dedup.py [--dev-impr 5000] [--users 2600]
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
DATA_ROOT = os.path.join(ROOT, "data_dedup_bench")
SCALE = "dedupbench"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dev-impr", type=int, default=5000)
    ap.add_argument("--users", type=int, default=2600)
    ap.add_argument("--news", type=int, default=8000)
    ap.add_argument("--bert", default="longformer")
    args = ap.parse_args()

    from news_recommendation_mind_tpu.config import Config
    from news_recommendation_mind_tpu.data.synthetic import (
        generate_synthetic_mind_large,
    )
    from news_recommendation_mind_tpu.evaluation.engine import (
        _collect, encode_all_news, fast_eval_scores,
    )
    from news_recommendation_mind_tpu.evaluation.metrics import (
        cal_metric_flat, group_flat,
    )
    from news_recommendation_mind_tpu.experiment import (
        build_data, build_eval_loaders, build_model, build_train_loader,
    )

    marker = os.path.join(DATA_ROOT, f"MIND{SCALE}_train", "behaviors.tsv")
    if not os.path.exists(marker):
        generate_synthetic_mind_large(
            DATA_ROOT, scale_name=SCALE, n_news=args.news,
            n_news_train=args.news - 2000, n_news_dev=args.news - 3000,
            n_users=args.users, n_impressions_train=4 * args.dev_impr,
            n_impressions_dev=args.dev_impr, n_impressions_test=100)

    def cfg(**kw):
        base = dict(scale=SCALE, data_root=DATA_ROOT,
                    cache_root=os.path.join(DATA_ROOT, "cache"),
                    ckpt_root=os.path.join(DATA_ROOT, "ckpt"),
                    result_root=os.path.join(DATA_ROOT, "results"),
                    batch_size=32, his_size=50, signal_length=30,
                    hidden_dim=768, embedding_dim=768, head_num=12,
                    dtype="bfloat16", device_gather=False,
                    compile_cache=True)
        base.update(kw)
        return Config(**base)

    data = build_data(cfg(model="plm", bert="newsbert", embedding="bert"),
                      splits=("train", "dev"))
    c = cfg(model="xformer", bert=args.bert, embedding="bert")
    train_loader = build_train_loader(c, data)
    model = build_model(c, data.vocab_size, data.user_num)
    import jax
    params = model.init(jax.random.PRNGKey(0), next(iter(train_loader)))
    news_loader, eval_loader = build_eval_loaders(c, data, "dev")

    t0 = time.perf_counter()
    table = encode_all_news(model, params, news_loader, model.hidden_dim)
    print(json.dumps({"stage": "phase1_news_sweep",
                      "seconds": round(time.perf_counter() - t0, 1),
                      "news": int(table.shape[0]) - 1}), flush=True)

    rows = np.concatenate([np.asarray(g)
                           for g in eval_loader.groups.values()])
    uniq = len(np.unique(eval_loader.b.uindex[rows]))
    results = {}
    for dedup in (False, True):
        for run in ("cold", "warm"):   # cold includes jit compiles
            t0 = time.perf_counter()
            batches = fast_eval_scores(model, params, table, eval_loader,
                                       dedup_users=dedup)
            impr, lengths, fs, fl = _collect(batches)
            glens, (gl, gp) = group_flat(impr, lengths, fl, fs)
            metrics = cal_metric_flat(glens, gl, gp, c.metric_list)
            dt = time.perf_counter() - t0
            results[dedup] = metrics
            print(json.dumps({
                "stage": "phase2" + ("_dedup" if dedup else "_live"),
                "run": run,
                "seconds": round(dt, 1), "chunk_rows": int(len(rows)),
                "unique_users": uniq, "impressions": int(len(glens)),
                **metrics}), flush=True)
    # the two paths are the same math per row but compile as different
    # XLA programs; under bfloat16 those round differently at the
    # ~1e-3 level (CPU float32 equality is pinned to 1e-6 by
    # tests/test_plm_xformer.py::test_user_dedup_matches_live_path)
    for k, v in results[False].items():
        assert abs(v - results[True][k]) <= 2e-3, \
            f"dedup changed {k} beyond bf16 rounding: {results}"
    print("# metrics agree across paths (<=2e-3, bf16 program rounding)",
          flush=True)


if __name__ == "__main__":
    main()
