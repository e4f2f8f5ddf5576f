"""MIND-large-shape dress rehearsal (round-2 VERDICT next-round item 2).

Generates a synthetic corpus at MINDlarge dimensions (the reference
hardcodes the real ones at utils/Manager.py:874-914: 876,956 users,
~2.2M train behavior rows, ~377k dev impressions, 120,961 test news) and
drives every pipeline stage at that scale, timing each:

  1. corpus generation (one-time, vectorized)
  2. word-vocab + word-level token cache build (two-tower path)
  3. WordPiece vocab training + native-WordPiece cache build (PLM path)
  4. behaviors parse (train 2.2M rows / dev 377k / test 300k)
  5. loader construction (vectorized ragged->dense history padding)
  6. 500 train steps on the TPU (flagship two-tower, device-gather)
  7. two-phase fast eval over all dev impressions (+ metrics)
  8. prediction.txt over the unlabeled test split
  9. bm25_rank sparse recall over dev

Prints one JSON line per stage and a final summary; results are recorded
in BASELINE.md. Usage:  python scripts/dress_rehearsal_large.py
[--stages 1,2,...] [--steps 500]
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
DATA_ROOT = os.path.join(ROOT, "data_large")
CACHE_ROOT = os.path.join(DATA_ROOT, "cache")
SCALE = "largesynth"

RESULTS = []


def stage(name):
    def deco(fn):
        fn._stage_name = name
        return fn
    return deco


def record(name, seconds, **extra):
    row = {"stage": name, "seconds": round(seconds, 1), **extra}
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def _cfg(**kw):
    from news_recommendation_mind_tpu.config import Config
    base = dict(scale=SCALE, data_root=DATA_ROOT, cache_root=CACHE_ROOT,
                ckpt_root=os.path.join(DATA_ROOT, "ckpt"),
                result_root=os.path.join(DATA_ROOT, "results"),
                batch_size=1024, his_size=50, signal_length=30,
                hidden_dim=150, embedding_dim=768, head_num=12,
                dtype="bfloat16", device_gather=True, compile_cache=True)
    base.update(kw)
    return Config(**base)


def run_generate():
    from news_recommendation_mind_tpu.data.synthetic import (
        generate_synthetic_mind_large,
    )
    marker = os.path.join(DATA_ROOT, f"MIND{SCALE}_train", "behaviors.tsv")
    if os.path.exists(marker):
        print("# corpus already generated", flush=True)
        return
    t0 = time.perf_counter()
    generate_synthetic_mind_large(DATA_ROOT, scale_name=SCALE)
    record("generate_corpus", time.perf_counter() - t0,
           train_rows=2_200_000, dev_impr=377_000, test_impr=300_000,
           news=121_000, users=870_000)


def run_word_cache():
    """Word backend: vocab build + token cache + behaviors parse (cold)."""
    from news_recommendation_mind_tpu.experiment import build_data
    cfg = _cfg(embedding="random")
    t0 = time.perf_counter()
    data = build_data(cfg, splits=("train", "dev", "test"))
    record("word_cache_and_behaviors_cold", time.perf_counter() - t0,
           vocab=data.vocab_size, users=data.user_num,
           news_train=int(data.news["train"].tokens.shape[0]) - 1,
           behaviors_train=len(data.behaviors["train"]),
           dev_chunks=len(data.behaviors["dev"]))
    t0 = time.perf_counter()
    build_data(cfg, splits=("train", "dev", "test"))
    record("word_cache_and_behaviors_warm", time.perf_counter() - t0)
    return data


def run_wordpiece_cache():
    """PLM backend: WordPiece vocab training + native-WordPiece encode."""
    from news_recommendation_mind_tpu.experiment import build_data
    cfg = _cfg(model="plm", bert="newsbert", embedding="bert")
    t0 = time.perf_counter()
    data = build_data(cfg, splits=("train", "dev"))
    record("wordpiece_cache_cold", time.perf_counter() - t0,
           vocab=data.vocab_size,
           news_train=int(data.news["train"].tokens.shape[0]) - 1)
    t0 = time.perf_counter()
    build_data(cfg, splits=("train", "dev"))
    record("wordpiece_cache_warm", time.perf_counter() - t0)


def run_loaders(data=None):
    from news_recommendation_mind_tpu.experiment import (
        build_data, build_eval_loaders, build_train_loader,
    )
    cfg = _cfg(embedding="random")
    if data is None:
        data = build_data(cfg, splits=("train", "dev", "test"))
    t0 = time.perf_counter()
    train_loader = build_train_loader(cfg, data)
    record("train_loader_construct", time.perf_counter() - t0,
           rows=len(data.behaviors["train"]), backend=train_loader.backend,
           batches_per_epoch=len(train_loader))
    t0 = time.perf_counter()
    news_loader, eval_loader = build_eval_loaders(cfg, data, "dev")
    record("eval_loaders_construct", time.perf_counter() - t0,
           dev_chunks=len(data.behaviors["dev"]),
           eval_batches=len(eval_loader))
    return cfg, data, train_loader, news_loader, eval_loader


def run_train(cfg, data, train_loader, steps):
    import jax

    from news_recommendation_mind_tpu.config import apply_compile_cache
    from news_recommendation_mind_tpu.data.loader import (
        ensure_tokens, prefetch_to_device,
    )
    from news_recommendation_mind_tpu.experiment import build_model
    from news_recommendation_mind_tpu.parallel import make_mesh
    from news_recommendation_mind_tpu.parallel.mesh import batch_sharding
    from news_recommendation_mind_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )
    apply_compile_cache(cfg)
    model = build_model(cfg, data.vocab_size, data.user_num)
    sample = ensure_tokens(next(iter(train_loader)), train_loader)
    t0 = time.perf_counter()
    params = model.init(jax.random.PRNGKey(0), sample)
    opt = make_optimizer(cfg.lr, cfg.bert_lr)
    state = create_train_state(params, opt)
    mesh = make_mesh()
    step = make_train_step(
        model, opt, mesh=mesh, donate=True,
        news_table=(train_loader.news_tokens, train_loader.news_attn))
    record("model_init", time.perf_counter() - t0,
           user_num=data.user_num, vocab=data.vocab_size)

    rng = jax.random.PRNGKey(0)
    it = prefetch_to_device(iter(train_loader), size=2,
                            sharding=batch_sharding(mesh))
    # warmup/compile on the first few batches
    for _ in range(3):
        state, metrics = step(state, next(it), rng)
    float(metrics["loss"])
    t0 = time.perf_counter()
    done = 0
    for batch in it:
        state, metrics = step(state, batch, rng)
        done += 1
        if done >= steps:
            break
    loss = float(metrics["loss"])  # device->host sync (tunnel-honest)
    dt = time.perf_counter() - t0
    record("train_steps", dt, steps=done, batch=cfg.batch_size,
           examples_per_s=round(done * cfg.batch_size / dt, 1),
           final_loss=round(loss, 4))
    return model, state


def run_eval(cfg, data, model, state, news_loader, eval_loader):
    from news_recommendation_mind_tpu.evaluation.engine import (
        encode_all_news, evaluate,
    )
    t0 = time.perf_counter()
    table = encode_all_news(model, state.params, news_loader,
                            cfg.hidden_dim)
    record("eval_phase1_encode_news", time.perf_counter() - t0,
           news=int(table.shape[0]) - 1)
    t0 = time.perf_counter()
    metrics = evaluate(model, state.params, eval_loader, cfg.metric_list,
                       news_table=table)
    record("eval_phase2_and_metrics", time.perf_counter() - t0, **metrics)


def run_predictions(cfg, data, model, state):
    from news_recommendation_mind_tpu.evaluation.engine import (
        write_predictions,
    )
    from news_recommendation_mind_tpu.experiment import build_eval_loaders
    news_loader, eval_loader = build_eval_loaders(cfg, data, "test")
    t0 = time.perf_counter()
    path = write_predictions(model, state.params, eval_loader,
                             os.path.join(DATA_ROOT, "results"),
                             news_loader=news_loader,
                             hidden_dim=cfg.hidden_dim)
    n_lines = sum(1 for _ in open(path))
    record("test_predictions", time.perf_counter() - t0,
           impressions=n_lines)


def run_bm25(cfg, data, backend="native"):
    from news_recommendation_mind_tpu.evaluation.recall import (
        bm25_rank, impression_positives, recall_at_k,
    )
    news_tokens, _ = data.news["dev"].truncated(cfg.signal_length)
    b = data.behaviors["dev"]
    t0 = time.perf_counter()
    ranked = bm25_rank(news_tokens, b, top_k=100, backend=backend)
    dt = time.perf_counter() - t0
    pos = [impression_positives(b, j) for j in range(len(b))]
    rec = recall_at_k(ranked, pos)
    record(f"bm25_rank_dev_{backend}", dt, impressions=len(ranked), **rec)


def _timed_train(cfg, data, train_loader, model, steps, news_table=None):
    """Shared train-leg driver: init, compile, prefetch, timed steps."""
    import jax

    from news_recommendation_mind_tpu.config import (
        apply_compile_cache, apply_rng_impl,
    )
    from news_recommendation_mind_tpu.data.loader import (
        ensure_tokens, prefetch_to_device,
    )
    from news_recommendation_mind_tpu.parallel import make_mesh
    from news_recommendation_mind_tpu.parallel.mesh import batch_sharding
    from news_recommendation_mind_tpu.train import create_train_state
    from news_recommendation_mind_tpu.train.state import optimizer_for
    from news_recommendation_mind_tpu.train.step import make_train_step
    apply_rng_impl(cfg)
    apply_compile_cache(cfg)
    sample = ensure_tokens(next(iter(train_loader)), train_loader)
    t0 = time.perf_counter()
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    params = model.init(rngs, sample)
    opt = optimizer_for(cfg, total_steps=max(steps, 1))
    state = create_train_state(params, opt)
    mesh = make_mesh()
    step = make_train_step(model, opt, mesh=mesh, donate=True,
                           news_table=news_table)
    record(f"{cfg.model}_{cfg.bert}_model_init", time.perf_counter() - t0)
    rng = jax.random.PRNGKey(0)
    it = prefetch_to_device(iter(train_loader), size=2,
                            sharding=batch_sharding(mesh))
    for _ in range(3):
        state, metrics = step(state, next(it), rng)
    float(metrics["loss"])
    t0 = time.perf_counter()
    done = 0
    for batch in it:
        state, metrics = step(state, batch, rng)
        done += 1
        if done >= steps:
            break
    loss = float(metrics["loss"])  # device->host sync (tunnel-honest)
    dt = time.perf_counter() - t0
    record(f"{cfg.model}_{cfg.bert}_train_steps", dt, steps=done,
           batch=cfg.batch_size,
           examples_per_s=round(done * cfg.batch_size / dt, 1),
           final_loss=round(loss, 4))
    return state


def run_plm_family(steps):
    """PLM (newsbert) leg at MIND-large shape — round-3 VERDICT missing
    item 1: the reference's headline workload is a PLM on MINDlarge
    (one BERT pass per article, reference models/PLM.py:110-126), its
    phase-1 sweeps every split article through the PLM
    (utils/Manager.py:874-914; test split = 120,961 articles) and
    phase 2 covers all ~377k dev impressions."""
    from news_recommendation_mind_tpu.evaluation.engine import (
        encode_all_news, evaluate,
    )
    from news_recommendation_mind_tpu.experiment import (
        build_data, build_eval_loaders, build_model, build_train_loader,
    )
    cfg = _cfg(model="plm", bert="newsbert", embedding="bert",
               batch_size=128, hidden_dim=768, encoderU="attn")
    t0 = time.perf_counter()
    data = build_data(cfg, splits=("train", "dev", "test"))
    record("plm_build_data", time.perf_counter() - t0,
           vocab=data.vocab_size,
           news_dev=int(data.news["dev"].tokens.shape[0]) - 1,
           news_test=int(data.news["test"].tokens.shape[0]) - 1)
    train_loader = build_train_loader(cfg, data)
    assert train_loader.emit_tokens is False  # dedup + device-gather path
    model = build_model(cfg, data.vocab_size, data.user_num)
    state = _timed_train(cfg, data, train_loader, model, steps,
                         news_table=(train_loader.news_tokens,
                                     train_loader.news_attn))
    news_loader, eval_loader = build_eval_loaders(cfg, data, "dev")
    t0 = time.perf_counter()
    table = encode_all_news(model, state.params, news_loader,
                            model.hidden_dim)
    record("plm_eval_phase1_dev_sweep", time.perf_counter() - t0,
           news=int(table.shape[0]) - 1)
    t0 = time.perf_counter()
    metrics = evaluate(model, state.params, eval_loader, cfg.metric_list,
                       news_table=table)
    record("plm_eval_phase2_and_metrics", time.perf_counter() - t0,
           **metrics)
    # the reference's big one: every test-split article (~121k) through
    # the full PLM news tower once (utils/Manager.py:884-914)
    news_loader_t, _ = build_eval_loaders(cfg, data, "test")
    t0 = time.perf_counter()
    table_t = encode_all_news(model, state.params, news_loader_t,
                              model.hidden_dim)
    record("plm_eval_phase1_test_sweep", time.perf_counter() - t0,
           news=int(table_t.shape[0]) - 1)


def run_xformer_leg(steps, eval_batches, full_eval=False):
    """XFormer (longformer, S=1024) leg — the reference's long-context
    flagship (models/XFormer.py:78-99): live 1024-token user passes.
    Phase 2 runs a bounded slice of dev eval batches and extrapolates
    (recorded explicitly as measured + extrapolation); with
    ``full_eval`` it ALSO runs the complete 377k-impression dev eval
    end to end (unique-user sweep) and records the measured wall clock
    + metrics — the round-4 VERDICT's missing #1."""
    from news_recommendation_mind_tpu.evaluation.engine import (
        _collect, encode_all_news, fast_eval_scores,
    )
    from news_recommendation_mind_tpu.evaluation.metrics import (
        cal_metric_flat, group_flat,
    )
    from news_recommendation_mind_tpu.experiment import (
        build_data, build_eval_loaders, build_model, build_train_loader,
    )
    # longformer reuses the newsbert wordpiece token cache (one wordpiece
    # vocab per corpus; the XFormer consumes the same token matrices) —
    # the cache build itself is timed in the PLM leg
    cfg_data = _cfg(model="plm", bert="newsbert", embedding="bert")
    data = build_data(cfg_data, splits=("train", "dev"))
    cfg = _cfg(model="xformer", bert="longformer", embedding="bert",
               batch_size=32, hidden_dim=768, device_gather=False)
    train_loader = build_train_loader(cfg, data)
    model = build_model(cfg, data.vocab_size, data.user_num)
    state = _timed_train(cfg, data, train_loader, model, steps)
    news_loader, eval_loader = build_eval_loaders(cfg, data, "dev")
    t0 = time.perf_counter()
    table = encode_all_news(model, state.params, news_loader,
                            model.hidden_dim)
    record("xformer_eval_phase1_dev_sweep", time.perf_counter() - t0,
           news=int(table.shape[0]) - 1)
    # bounded phase 2: first K width-bucketed batches. Bounding by
    # subsetting the loader's chunk groups (rather than islice-ing the
    # batch stream) keeps the loader object intact so the unique-user
    # dedup sweep (engine.encode_unique_users) engages exactly as it
    # does on a full eval; the slice's duplicate-user rate matches the
    # corpus (users are iid across impressions).
    import copy
    total_batches = len(eval_loader)
    bounded_loader = copy.copy(eval_loader)
    groups, left = {}, eval_batches * eval_loader.batch_size
    for w in sorted(eval_loader.groups):
        if left <= 0:
            break
        take = eval_loader.groups[w][:left]
        groups[w] = take
        left -= len(take)
    bounded_loader.groups = groups
    n_rows = sum(len(g) for g in groups.values())

    for dedup in (False, True):
        t0 = time.perf_counter()
        batches = fast_eval_scores(model, state.params, table,
                                   bounded_loader, dedup_users=dedup)
        impr, lengths, fs, fl = _collect(batches)
        glens, (gl, gp) = group_flat(impr, lengths, fl, fs)
        metrics = cal_metric_flat(glens, gl, gp, cfg.metric_list)
        dt = time.perf_counter() - t0
        record("xformer_eval_phase2_slice" + ("_dedup" if dedup else ""),
               dt, batches=len(bounded_loader), chunk_rows=n_rows,
               impressions=int(len(glens)),
               extrapolated_full_s=round(
                   dt / max(n_rows, 1) * sum(
                       len(g) for g in eval_loader.groups.values()), 1),
               total_batches=total_batches, **metrics)

    if full_eval:
        # the real thing, measured once end to end: every dev
        # impression, unique-user sweep (engine default), flat metrics
        t0 = time.perf_counter()
        batches = fast_eval_scores(model, state.params, table,
                                   eval_loader, dedup_users=True)
        impr, lengths, fs, fl = _collect(batches)
        glens, (gl, gp) = group_flat(impr, lengths, fl, fs)
        metrics = cal_metric_flat(glens, gl, gp, cfg.metric_list)
        dt = time.perf_counter() - t0
        record("xformer_eval_phase2_FULL_dedup", dt,
               batches=total_batches,
               chunk_rows=sum(len(g)
                              for g in eval_loader.groups.values()),
               impressions=int(len(glens)), **metrics)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="all")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--plm-steps", type=int, default=300)
    ap.add_argument("--xformer-steps", type=int, default=60)
    ap.add_argument("--xformer-eval-batches", type=int, default=200)
    ap.add_argument("--xformer-full-eval", action="store_true")
    ap.add_argument("--bm25-backend", default="native")
    args = ap.parse_args()
    want = (None if args.stages == "all"
            else set(args.stages.split(",")))

    def on(name):
        return want is None or name in want

    t_all = time.perf_counter()
    if on("generate"):
        run_generate()
    data = None
    if on("word_cache"):
        data = run_word_cache()
    if on("wordpiece"):
        run_wordpiece_cache()
    if on("train") or on("eval") or on("predict") or on("loaders") \
            or on("bm25"):
        cfg, data, train_loader, news_loader, eval_loader = \
            run_loaders(data)
        if on("train") or on("eval") or on("predict"):
            model, state = run_train(cfg, data, train_loader, args.steps)
            if on("eval"):
                run_eval(cfg, data, model, state, news_loader, eval_loader)
            if on("predict"):
                run_predictions(cfg, data, model, state)
        if on("bm25"):
            run_bm25(cfg, data, backend=args.bm25_backend)
    if on("plm"):
        run_plm_family(args.plm_steps)
    if on("xformer"):
        run_xformer_leg(args.xformer_steps, args.xformer_eval_batches,
                        full_eval=args.xformer_full_eval)
    record("total", time.perf_counter() - t_all)
    print("# summary")
    for row in RESULTS:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
