"""PLM (newsbert) step microbenchmark — the round-3 perf frontier.

Round 2 pinned the flagship two-tower near its HBM floor and left the
PLM step as the next lever (BASELINE.md "PLM (newsbert) step
decomposition": 136 ms at bs=128 / U=2048 / S=30 ≈ 40% MXU, backward
~75 ms unprofiled below phase level). This script decomposes the step
and measures candidate optimizations, with the honest device→host sync
(float(value)) this machine's tunnel backend requires.

Usage: python scripts/bench_plm.py [--variants base,remat,...]
Prints one JSON line per measurement.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BS, U, S = 128, 2048, 30
HIS, CDD = 50, 5
WARMUP, STEPS = 4, 20


def sync(x):
    import jax
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])


def timeit(fn, *args):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / STEPS * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="all")
    args = ap.parse_args()
    want = None if args.variants == "all" else set(args.variants.split(","))

    import jax
    import jax.numpy as jnp
    import optax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "cache", "jax_compile")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # the Trainer's production RNG setup (config.apply_rng_impl): the TPU
    # hardware generator makes backward-pass dropout-mask regeneration
    # nearly free (threefry regen measured 26% of the newsbert step)
    if any(d.platform != "cpu" for d in jax.devices()):
        jax.config.update("jax_default_prng_impl", "rbg")

    from news_recommendation_mind_tpu.models.bert import (
        BertModel, bert_variant,
    )
    from news_recommendation_mind_tpu.models.plm import PLM
    from news_recommendation_mind_tpu.models import make_user_encoder
    from news_recommendation_mind_tpu.models.two_tower import (
        forward_from_unique, train_loss,
    )
    from news_recommendation_mind_tpu.train import (
        create_train_state, make_fused_optimizer, make_optimizer,
        make_train_step,
    )
    from news_recommendation_mind_tpu.train.state import TrainState

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 30000, (U, S)).astype(np.int32)
    batch = {
        "uniq_token": tokens,
        "uniq_attn": np.ones((U, S), np.float32),
        "cdd_pos": rng.integers(0, U, (BS, CDD)).astype(np.int32),
        "his_pos": rng.integers(0, U, (BS, HIS)).astype(np.int32),
        "his_mask": np.ones((BS, HIS), np.float32),
        "cdd_mask": np.ones((BS, CDD), np.float32),
        "label": np.zeros(BS, np.int32),
        "user_id": rng.integers(0, 1000, BS).astype(np.int32),
    }

    def build(variant_kw=None, dtype=jnp.bfloat16):
        v = bert_variant("newsbert", vocab_size=30522, signal_length=S)
        if variant_kw:
            v = v.replace(**variant_kw)
        model = PLM(bert=BertModel(v, dtype=dtype),
                    user_encoder=make_user_encoder("attn", hidden_dim=768,
                                                   head_num=12, dtype=dtype),
                    hidden_dim=768)
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch, False, method=forward_from_unique)
        return model, params

    key = jax.random.PRNGKey(0)
    results = {}

    def report(name, ms, **extra):
        results[name] = ms
        print(json.dumps({"bench": name, "ms": round(ms, 2), **extra}),
              flush=True)

    def on(name):
        return want is None or name in want

    model, params = build()
    # donated states delete their arrays; keep a host master copy and
    # re-materialise fresh device params per variant
    params_host = jax.device_get(params)

    def fresh_params():
        return jax.device_put(params_host)

    opt = make_fused_optimizer(1e-4, 6e-6)

    def full_step(remat):
        def step(state, batch, k):
            def fwd(p, b, kk):
                return model.apply(p, b, False, rngs={"dropout": kk},
                                   method=forward_from_unique)
            f = jax.checkpoint(fwd) if remat else fwd

            def loss_fn(p):
                return train_loss(f(p, batch, k), batch["label"],
                                  batch["cdd_mask"])
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            if hasattr(opt, "fused_apply"):
                new_p, opt_state = opt.fused_apply(
                    state.params, state.opt_state, grads)
            else:
                updates, opt_state = opt.update(grads, state.opt_state,
                                                state.params)
                new_p = optax.apply_updates(state.params, updates)
            return TrainState(step=state.step + 1, params=new_p,
                              opt_state=opt_state), loss
        return jax.jit(step, donate_argnums=(0,))

    if on("base"):
        state = create_train_state(fresh_params(), opt)
        step = full_step(remat=False)
        st, loss = step(state, batch, key)
        for _ in range(WARMUP):
            st, loss = step(st, batch, key)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st, loss = step(st, batch, key)
        float(loss)
        report("full_step", (time.perf_counter() - t0) / STEPS * 1e3,
               examples_per_s=round(BS * STEPS / (time.perf_counter() - t0)))

    if on("remat"):
        state = create_train_state(fresh_params(), opt)
        step = full_step(remat=True)
        st, loss = step(state, batch, key)
        for _ in range(WARMUP):
            st, loss = step(st, batch, key)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st, loss = step(st, batch, key)
        float(loss)
        report("full_step_remat", (time.perf_counter() - t0) / STEPS * 1e3)

    if on("fwd"):
        @jax.jit
        def fwd(p, b, k):
            return train_loss(model.apply(p, b, False, rngs={"dropout": k},
                                          method=forward_from_unique),
                              b["label"], b["cdd_mask"])
        params = fresh_params()
        report("forward_loss", timeit(fwd, params, batch, key))

        @jax.jit
        def fwd_det(p, b):
            return train_loss(model.apply(p, b, True,
                                          method=forward_from_unique),
                              b["label"], b["cdd_mask"])
        report("forward_loss_nodropout", timeit(fwd_det, params, batch))

    if on("bwd"):
        @jax.jit
        def grad_only(p, b, k):
            def loss_fn(pp):
                return train_loss(
                    model.apply(pp, b, False, rngs={"dropout": k},
                                method=forward_from_unique),
                    b["label"], b["cdd_mask"])
            return jax.grad(loss_fn)(p)
        report("forward_backward", timeit(grad_only, params, batch, key))

        # BERT tower alone (no user encoder / score / loss)
        @jax.jit
        def bert_grad(p, b, k):
            def loss_fn(pp):
                reprs = model.apply(pp, b["uniq_token"][None],
                                    b["uniq_attn"][None], False,
                                    rngs={"dropout": k},
                                    method=PLM.encode_news)[0]
                return reprs.astype(jnp.float32).mean()
            return jax.grad(loss_fn)(p)
        report("bert_only_fwd_bwd", timeit(bert_grad, params, batch, key))

        @jax.jit
        def bert_fwd(p, b, k):
            return model.apply(p, b["uniq_token"][None],
                               b["uniq_attn"][None], False,
                               rngs={"dropout": k},
                               method=PLM.encode_news)
        report("bert_only_fwd", timeit(bert_fwd, params, batch, key))

    if on("adam8"):
        # bf16 Adam moments: halves optimizer-state HBM traffic
        opt8 = optax.adam(1e-4, mu_dtype=jnp.bfloat16)
        state = create_train_state(fresh_params(), opt8)

        def step(state, batch, k):
            def loss_fn(p):
                return train_loss(
                    model.apply(p, batch, False, rngs={"dropout": k},
                                method=forward_from_unique),
                    batch["label"], batch["cdd_mask"])
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = opt8.update(grads, state.opt_state,
                                             state.params)
            new_p = optax.apply_updates(state.params, updates)
            return TrainState(step=state.step + 1, params=new_p,
                              opt_state=opt_state), loss
        jstep = jax.jit(step, donate_argnums=(0,))
        st, loss = jstep(state, batch, key)
        for _ in range(WARMUP):
            st, loss = jstep(st, batch, key)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st, loss = jstep(st, batch, key)
        float(loss)
        report("full_step_bf16_mu", (time.perf_counter() - t0) / STEPS * 1e3)

    if on("cost"):
        # XLA's own FLOP/byte estimate for the full step
        step = full_step(remat=False)
        state = create_train_state(fresh_params(), opt)
        lowered = step.lower(state, batch, key)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = ca.get("flops", 0.0)
        print(json.dumps({"bench": "cost_analysis",
                          "tflops": round(flops / 1e12, 2),
                          "bytes_gb": round(ca.get("bytes accessed", 0.0)
                                            / 1e9, 2)}), flush=True)

    print(json.dumps({"summary": {k: round(v, 2)
                                  for k, v in results.items()}}))


if __name__ == "__main__":
    main()
