"""Configuration system: frozen dataclass + CLI parser + derived names.

Replaces the reference's argparse-in-constructor Manager flag system
(reference utils/Manager.py:38-151): every reference flag has a field here,
plus TPU-specific fields (mesh shape, dtype policy, prefetch depth). The
experiment name is derived from component choices exactly like the
reference (reference models/TwoTower.py:16-18, models/PLM.py:88-90,
models/XFormer.py:54-56) and is used for all artifact paths
(reference utils/Manager.py:289-305, 837-840).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple


@dataclass(frozen=True)
class Config:
    # ---- experiment identity ----------------------------------------------
    scale: str = "demo"              # demo | small | large | whole | synthetic
    mode: str = "train"              # train | dev | test | encode | inspect
    model: str = "twotower"          # twotower | plm | xformer

    # ---- data --------------------------------------------------------------
    data_root: str = "data"          # root for MIND tsv files + caches
    cache_root: str = "data/cache"   # token/behavior/tensor caches
    ckpt_root: str = "data/model_params"
    result_root: str = "data/results"
    signal_length: int = 30          # tokens kept per article at load
    max_token_length: int = 512      # tokens stored in the cache
    his_size: int = 50               # history length
    impr_size: int = 2000            # eval impression chunk size
    npratio: int = 4                 # negatives per positive (train)
    shuffle_pos: bool = False        # shuffle candidate positions in train
    descend_history: bool = False    # reverse history order
    sequential: bool = False         # construct sequential behaviors

    # ---- model dimensions ---------------------------------------------------
    embedding: str = "random"        # random | glove | bert
    encoderN: str = "cnn"            # cnn | mha | transformer | rnn
    encoderU: str = "lstm"           # lstm | gru | lstur | mha | attn | avg
    hidden_dim: int = 150
    embedding_dim: int = 768
    bert_dim: int = 768
    head_num: int = 12
    dropout_p: float = 0.2
    vocab_size: int = 30522          # set from tokenizer at data build
    bert: str = "bert"               # PLM variant for plm/xformer models
    bert_layers: int = 0             # override PLM depth (0 = variant default)
    debias: bool = False             # learned per-user bias on user repr

    # ---- training -----------------------------------------------------------
    batch_size: int = 32
    batch_size_news: int = 500       # news-encoding batch (fast eval)
    batch_size_history: int = 16     # encode-mode batch
    epochs: int = 10
    lr: float = 1e-4
    bert_lr: float = 6e-6
    scheduler: str = "none"          # none | linear
    warmup: int = 100
    step_budget: int = 0             # optional hard cap on train steps (0 = off)
    save_step: int = 0               # eval+save every N steps (0 = per-epoch)
    hold_step: int = 0               # skip eval before this step
    checkpoint: int = 0              # resume-from step (-1 = newest)
    seed: int = 42
    metrics: str = "auc,mean_mrr,ndcg@5;10"
    recall_type: str = ""            # "" | s (BM25) | d (dense two-tower)
                                     # | sd (RRF hybrid); setting it forces
                                     # mode=recall like the reference
                                     # (utils/Manager.py:52, 117-119)
    fast: bool = True                # two-phase fast eval
    interval: int = 10               # progress-log interval (steps)

    # ---- TPU execution ------------------------------------------------------
    dtype: str = "bfloat16"          # compute dtype (params stay float32)
    mesh_shape: Tuple[int, ...] = () # () = all devices on one 'data' axis
    mesh_axes: Tuple[str, ...] = ("data",)
    model_parallel: int = 1          # size of 'model' axis for sharded tables
    zero1: bool = False              # ZeRO-1: shard dense Adam moments over 'data'
    prefetch: int = 2                # host→device prefetch depth
    donate: bool = True              # donate train state in the jitted step
    remat: bool = False              # jax.checkpoint the encoders
    profile_dir: str = ""            # write a jax.profiler trace here
    async_save: bool = False         # overlap checkpoint IO with training
    fused_adam: bool = True          # fused Pallas Adam leaves on TPU
                                     # (train/state.py optimizer_for)
    anomaly: bool = False            # jax_debug_nans (reference --anomaly)
    device_gather: bool = True       # keep token cache in HBM, ship ids only
    fused_embedding: bool = True     # fuse embedding through the CNN conv
                                     # (exact; cnn encoder, unsharded table)
    dedup_news: bool = True          # encode each distinct news once per
                                     # step (device_gather; twotower/plm)
    steps_per_call: int = 1          # fuse K train steps per device call
    nan_recover: int = 0             # auto-restore from ckpt on NaN loss
                                     # up to N times (0 = fail fast)
    grad_norm: bool = False          # report per-step global grad norm
                                     # (costs a full gradient read ~1.5ms
                                     # at flagship dims; diagnostics only)
    compile_cache: bool = True       # persistent XLA compile cache under
                                     # {cache_root}/jax_compile (repeat
                                     # runs skip 30-70s tunnel compiles)
    rng_impl: str = "auto"           # auto | threefry | rbg: dropout RNG.
                                     # auto = hardware RNG (rbg) on TPU,
                                     # threefry elsewhere

    # ---- bookkeeping --------------------------------------------------------
    world_size: int = 1              # number of processes (multi-host)
    rank: int = 0
    email: Optional[str] = None      # result email destination (optional)

    # ------------------------------------------------------------------------
    @property
    def cdd_size(self) -> int:
        # candidate set = 1 positive + npratio negatives
        # (reference utils/Manager.py:105)
        return self.npratio + 1

    @property
    def metric_list(self) -> List[str]:
        return [m.strip() for m in self.metrics.split(",") if m.strip()]

    @property
    def name(self) -> str:
        """Derived experiment name, mirrors reference naming.

        reference models/TwoTower.py:16-18 (twotower__{encoderN}__{encoderU}),
        models/PLM.py:88-90 (plm__{bert}__{encoderU}),
        models/XFormer.py:54-56 (xformer__{bert}).
        """
        if self.model == "twotower":
            return "__".join(["twotower", self.encoderN, self.encoderU])
        if self.model == "plm":
            return "__".join(["plm", self.bert, self.encoderU])
        if self.model == "xformer":
            return "__".join(["xformer", self.bert])
        return self.model

    # artifact paths (reference utils/Manager.py:289-305, 491, 837-840) ------
    def ckpt_dir(self) -> str:
        return os.path.join(self.ckpt_root, self.name)

    def news_repr_path(self, mode: Optional[str] = None) -> str:
        mode = mode or ("test" if self.mode == "test" else "dev")
        return os.path.join(
            self.cache_root, "tensors", self.name, self.scale, mode, "news.npy"
        )

    def result_dir(self, step: int) -> str:
        return os.path.join(
            self.result_root, self.name, f"{self.scale}_step{step}"
        )

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


def _forms(name: str) -> list:
    # every flag answers to both dashed and underscored spellings
    # (--device-gather / --device_gather), deduped when they coincide
    dashed = name.replace("_", "-")
    return [f"--{dashed}"] + ([f"--{name}"] if name != dashed else [])


def _add_bool_flag(p: argparse.ArgumentParser, name: str, default: bool) -> None:
    # both --x / --no-x so any default can be overridden from the CLI
    group = p.add_mutually_exclusive_group()
    group.add_argument(*_forms(name), dest=name, action="store_true")
    group.add_argument(*[f.replace("--", "--no-", 1) for f in _forms(name)],
                       dest=name, action="store_false")
    p.set_defaults(**{name: default})


def build_parser(defaults: Optional[Config] = None) -> argparse.ArgumentParser:
    """Build an argparse parser covering every Config field.

    Mirrors the reference's flag surface (reference utils/Manager.py:44-101)
    with short aliases for the most-used flags.
    """
    cfg = defaults or Config()
    p = argparse.ArgumentParser(description="TPU-native MIND news recommendation")
    alias = {
        "scale": ["-s"], "mode": ["-m"], "epochs": ["-e"],
        "batch_size": ["-bs"], "his_size": ["-hs"], "signal_length": ["-sl"],
        "impr_size": ["-is"], "hidden_dim": ["-hd"], "step_budget": ["--step"],
        "recall_type": ["-rt"],
    }
    for f in dataclasses.fields(Config):
        names = alias.get(f.name, []) + _forms(f.name)
        if isinstance(getattr(cfg, f.name), bool):
            _add_bool_flag(p, f.name, getattr(cfg, f.name))
            continue
        default = getattr(cfg, f.name)
        if isinstance(default, tuple):
            p.add_argument(*names, dest=f.name, type=int, nargs="*",
                           default=list(default))
        elif default is None:
            p.add_argument(*names, dest=f.name, type=str, default=None)
        else:
            p.add_argument(*names, dest=f.name, type=type(default),
                           default=default)
    return p


def parse_config(argv: Optional[Sequence[str]] = None,
                 defaults: Optional[Config] = None, **overrides: Any) -> Config:
    """Parse argv (or any object's attributes) into a frozen Config.

    Like the reference Manager, a config *object* can be injected instead of
    argv (reference utils/Manager.py:38-42, 131-132; example
    data/configs/demo.py).
    """
    parser = build_parser(defaults)
    ns = parser.parse_args(argv)
    kw = vars(ns)
    for k in ("mesh_shape", "mesh_axes"):
        if k in kw and isinstance(kw[k], list):
            kw[k] = tuple(kw[k])
    kw.update(overrides)
    if kw.get("recall_type"):
        # -rt forces recall mode, like the reference (utils/Manager.py:117-119)
        kw["mode"] = "recall"
    return Config(**kw)


def config_from_object(obj: Any) -> Config:
    """Build a Config from any object carrying config attributes."""
    names = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in vars(obj).items() if k in names}
    return Config(**kw)


def apply_rng_impl(cfg: Config) -> None:
    """Select the dropout-key RNG before any PRNGKey is created.

    XLA rematerialises dropout masks in the backward pass rather than
    storing them (hundreds of MB per BERT layer at production shapes);
    with the default threefry generator that recompute is the single
    biggest cost of the PLM train step (measured 26% of the newsbert
    step on the v5e). The TPU hardware generator ('rbg') makes the regen
    nearly free — same Bernoulli distribution, different stream. 'auto'
    picks rbg on TPU and keeps threefry elsewhere (CPU tests stay
    bit-stable against recorded expectations).
    """
    import jax

    impl = cfg.rng_impl
    if impl == "auto":
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    elif impl == "threefry":
        impl = "threefry2x32"
    jax.config.update("jax_default_prng_impl", impl)


def apply_compile_cache(cfg: Config) -> None:
    """Enable JAX's persistent compilation cache under the cache root.

    On remote-compile backends (this machine's tunneled v5e) a flagship
    train-step compile costs 30-70s; the persistent cache makes repeat
    runs of the same configuration skip it entirely. Serialization was
    verified working on the axon backend. Opt out with
    --no-compile-cache (e.g. when benchmarking cold-compile latency)."""
    if not cfg.compile_cache:
        return
    import os

    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        # an explicit env override wins over the per-config default —
        # lets a CI host (or the test suite) share one cache across many
        # configs whose cache_roots differ
        return
    path = os.path.join(cfg.cache_root, "jax_compile")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
