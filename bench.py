"""Benchmark: flagship train-step throughput on the local accelerator.

Measures examples/s for the flagship configuration (TwoTower CNN news
encoder + LSTM user encoder at reference hyperparameters: hidden 150,
embedding 768, signal_length 30, his_size 50, npratio 4 — reference
utils/Manager.py:44-106) in bfloat16 with a device-resident batch, i.e.
pure train-step throughput (forward + backward + Adam fused in one XLA
executable). Generalizes the reference's only built-in timer (`encode`
mode wall-clock, reference utils/Manager.py:855-871) into the
examples/s/chip headline metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is relative to BASELINE_EXAMPLES_PER_S, the round-1
measurement on this repo's TPU v5e chip (the reference publishes no
numbers — BASELINE.md).

Measurement honesty: on this machine's remote (axon-tunnel) TPU backend,
``jax.block_until_ready`` returns without draining queued execution, so
naive timing overstates throughput by orders of magnitude. The only
reliable synchronization point is a device→host value transfer, so each
timed window ends with ``float(loss)`` and the transfer is inside the
measured interval (its ~25ms round trip is amortized over the window).
"""
from __future__ import annotations

import json
import time

import numpy as np

# Honest round-1 measurement on the single TPU v5e chip (2026-08-18,
# batch 1024, host-synced via float(loss) — see module docstring).
# vs_baseline tracks speedups across rounds relative to this.
BASELINE_EXAMPLES_PER_S = 6980.0

BATCH_SIZE = 1024
VOCAB = 30522
EMBEDDING_DIM = 768
HIDDEN_DIM = 150
SIGNAL_LENGTH = 30
HIS_SIZE = 50
NPRATIO = 4
WARMUP_STEPS = 5
MEASURE_STEPS = 30


def _wait_for_devices(retries: int = 6, delay_s: float = 20.0):
    """The dev chip is exclusive; if another process still holds it,
    back off briefly instead of failing the round's benchmark."""
    import jax
    for attempt in range(retries):
        try:
            return jax.devices()
        except RuntimeError as e:
            if attempt == retries - 1:
                raise
            print(f"# devices unavailable ({e}); retrying in {delay_s}s",
                  flush=True)
            time.sleep(delay_s)


def bench_newsbert(jax, mesh) -> float:
    """PLM (newsbert) dedup train-step throughput — the round-3 perf
    frontier (BASELINE.md "PLM (newsbert) step decomposition"): bs=128,
    U=2048 unique articles, S=30, bf16, hardware-RNG dropout, fused
    Pallas short-MHSA + fused Adam. Returns examples/s."""
    import jax.numpy as jnp
    import numpy as np

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

    BS, U, S = 128, 2048, 30
    rng = np.random.default_rng(0)
    batch = {
        "uniq_token": rng.integers(1, VOCAB, (U, S)).astype(np.int32),
        "uniq_attn": np.ones((U, S), np.float32),
        "cdd_pos": rng.integers(0, U, (BS, 5)).astype(np.int32),
        "his_pos": rng.integers(0, U, (BS, HIS_SIZE)).astype(np.int32),
        "his_mask": np.ones((BS, HIS_SIZE), np.float32),
        "cdd_mask": np.ones((BS, 5), np.float32),
        "label": np.zeros(BS, np.int32),
        "user_id": rng.integers(0, 1000, BS).astype(np.int32),
    }
    variant = bert_variant("newsbert", vocab_size=VOCAB, signal_length=S)
    model = PLM(bert=BertModel(variant, dtype=jnp.bfloat16),
                user_encoder=make_user_encoder("attn", hidden_dim=768,
                                               head_num=12,
                                               dtype=jnp.bfloat16),
                hidden_dim=768)
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        batch, False, method=forward_from_unique)
    opt = make_fused_optimizer(1e-4, 6e-6)
    state = create_train_state(params, opt)
    # the production Trainer path: ids-only batch, token cache resident
    # in HBM, in-step gather (train/step.py dedup branch)
    n_news = 30_000
    table = (rng.integers(1, VOCAB, (n_news + 1, S)).astype(np.int32),
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
    N = 20
    for _ in range(N):
        state, metrics = step(state, dedup_batch, key)
    float(metrics["loss"])
    return BS * N / (time.perf_counter() - t0)


def bench_xformer(jax, mesh, bert: str = "longformer",
                  bs: int = 32) -> float:
    """XFormer train-step throughput — the long-context family
    (reference models/XFormer.py:78-99). ``longformer`` (S=1024,
    window-32 local+global via the fused Pallas banded kernel) at
    bs=32; ``bigbird`` (S=1024, block-sparse via the Pallas bigbird
    kernel, round 5) at bs=16 (all bigbird realizations OOM at bs=32×12
    layers without remat — BASELINE.md). his 50×30 tokens concatenated
    to one 1024-token user pass + 5 candidate passes, bf16. Returns
    examples/s. Anchors: longformer 132 ex/s (round 1); bigbird dense
    57.2 ex/s (round 5 A/B)."""
    import jax.numpy as jnp

    from news_recommendation_mind_tpu.models.bert import (
        BertModel, bert_variant,
    )
    from news_recommendation_mind_tpu.models.xformer import XFormer
    from news_recommendation_mind_tpu.train import (
        create_train_state, make_fused_optimizer, make_train_step,
    )

    BS, CDD = bs, NPRATIO + 1
    variant = bert_variant(bert, vocab_size=VOCAB,
                           signal_length=SIGNAL_LENGTH)
    model = XFormer(bert=BertModel(variant, dtype=jnp.bfloat16),
                    hidden_dim=variant.hidden_size,
                    max_length=variant.max_length,
                    max_length_per_history=variant.max_length_per_history)
    rng = np.random.default_rng(0)
    batch = {
        "cdd_token": rng.integers(
            1, VOCAB, (BS, CDD, SIGNAL_LENGTH)).astype(np.int32),
        "cdd_attn": np.ones((BS, CDD, SIGNAL_LENGTH), np.float32),
        "his_token": rng.integers(
            1, VOCAB, (BS, HIS_SIZE, SIGNAL_LENGTH)).astype(np.int32),
        "his_attn": np.ones((BS, HIS_SIZE, SIGNAL_LENGTH), np.float32),
        "his_mask": np.ones((BS, HIS_SIZE), np.float32),
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
    for _ in range(3):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])
    return BS * N / (time.perf_counter() - t0)


def main() -> None:
    import os

    import jax

    # persistent compile cache (config.apply_compile_cache equivalent):
    # the remote-compile tunnel charges minutes for a cold compile; warm
    # reruns of this same program skip it (measured 327.6s -> 58.3s on a
    # toy chain, BASELINE.md round 2)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "data", "cache", "jax_compile")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    _wait_for_devices()
    # production RNG setup (config.apply_rng_impl): the TPU hardware
    # generator makes backward-pass dropout-mask regeneration nearly
    # free — threefry regen costs ~26% of the newsbert step
    if any(d.platform != "cpu" for d in jax.devices()):
        jax.config.update("jax_default_prng_impl", "rbg")

    from news_recommendation_mind_tpu.models import (
        TwoTower, make_user_encoder,
    )
    from news_recommendation_mind_tpu.models.news_encoders import (
        FusedCnnNewsEncoder,
    )
    from news_recommendation_mind_tpu.parallel import make_mesh, shard_batch
    from news_recommendation_mind_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )
    import jax.numpy as jnp

    # the production build_model path: embedding fused through the conv
    # (exact — see FusedCnnNewsEncoder; cfg.fused_embedding default)
    model = TwoTower(
        embedding=None,
        news_encoder=FusedCnnNewsEncoder(VOCAB, EMBEDDING_DIM, HIDDEN_DIM,
                                         dtype=jnp.bfloat16),
        user_encoder=make_user_encoder(
            "lstm", hidden_dim=HIDDEN_DIM, head_num=12, dtype=jnp.bfloat16),
        hidden_dim=HIDDEN_DIM,
    )
    rng = np.random.default_rng(0)
    cdd = NPRATIO + 1
    batch = {
        "user_id": rng.integers(1, 1000, BATCH_SIZE).astype(np.int32),
        "cdd_token": rng.integers(
            0, VOCAB, (BATCH_SIZE, cdd, SIGNAL_LENGTH)).astype(np.int32),
        "cdd_attn": np.ones((BATCH_SIZE, cdd, SIGNAL_LENGTH), np.float32),
        "his_token": rng.integers(
            0, VOCAB, (BATCH_SIZE, HIS_SIZE, SIGNAL_LENGTH)).astype(np.int32),
        "his_attn": np.ones((BATCH_SIZE, HIS_SIZE, SIGNAL_LENGTH),
                            np.float32),
        "his_mask": np.ones((BATCH_SIZE, HIS_SIZE), np.float32),
        "cdd_mask": np.ones((BATCH_SIZE, cdd), np.float32),
        "label": np.zeros(BATCH_SIZE, np.int32),
    }

    n_chips = len(jax.devices())
    mesh = make_mesh()
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = make_optimizer(1e-4, 6e-6)
    state = create_train_state(params, opt)
    step = make_train_step(model, opt, mesh=mesh, donate=True)
    key = jax.random.PRNGKey(0)
    device_batch = shard_batch(batch, mesh)

    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, device_batch, key)
    # block_until_ready does NOT drain the remote axon tunnel; a
    # device->host transfer is the only honest sync (module docstring)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, metrics = step(state, device_batch, key)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    examples_per_s = BATCH_SIZE * MEASURE_STEPS / dt
    per_chip = examples_per_s / n_chips
    vs = (per_chip / BASELINE_EXAMPLES_PER_S
          if BASELINE_EXAMPLES_PER_S else 1.0)
    nb = bench_newsbert(jax, mesh) / n_chips
    xf = bench_xformer(jax, mesh) / n_chips
    extra = {}
    try:
        # the block-sparse flagship (round 5); guarded so a failure
        # cannot take down the headline line
        bb = bench_xformer(jax, mesh, bert="bigbird", bs=16) / n_chips
        extra = {"xformer_bigbird_examples_per_s_per_chip": round(bb, 1),
                 # round-5 dense-path A/B anchor: 57.2 ex/s
                 "xformer_bigbird_vs_dense": round(bb / 57.2, 3)}
    except Exception as e:
        import sys
        print(f"# bigbird bench leg failed: {e!r}", file=sys.stderr)
    print(json.dumps({
        "metric": "train_examples_per_s_per_chip",
        "value": round(per_chip, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs, 3),
        # the PLM-family frontier tracked since round 3 (round-2 anchor:
        # 136 ms/step = 941 ex/s/chip at the same shapes)
        "newsbert_examples_per_s_per_chip": round(nb, 1),
        "newsbert_vs_r2": round(nb / 941.0, 3),
        # the long-context family, tracked since round 4 (round-1
        # anchor: 132 ex/s at the same S=1024 longformer shapes)
        "xformer_examples_per_s_per_chip": round(xf, 1),
        "xformer_vs_r1": round(xf / 132.0, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
