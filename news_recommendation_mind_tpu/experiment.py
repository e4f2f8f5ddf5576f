"""Experiment assembly: Config → tokenizer, caches, loaders, model.

The counterpart of the reference Manager's prepare() + entry-script model
construction (reference utils/Manager.py:183-286, twotower.py:7-59): one
place that resolves dataset directories (MIND{scale}_{split} convention),
builds/loads the token + behavior caches, constructs fixed-shape loaders,
and assembles the model module for the configured components.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .config import Config
from .data import (
    EvalLoader, HistoryLoader, NewsLoader, TrainLoader,
    build_behaviors, build_news_cache, generate_synthetic_mind, get_tokenizer,
)
from .data.cache import Behaviors, NewsCache, parse_news_tsv
from .models import TwoTower, WordEmbedding, make_news_encoder, \
    make_user_encoder


def split_dir(cfg: Config, split: str) -> str:
    return os.path.join(cfg.data_root, f"MIND{cfg.scale}_{split}")


def ensure_dataset(cfg: Config) -> None:
    """Generate the synthetic dataset on demand (zero-egress environments
    have no MIND download; real MIND data is used as-is when present)."""
    if cfg.scale == "synthetic" and not os.path.exists(
            os.path.join(split_dir(cfg, "train"), "news.tsv")):
        generate_synthetic_mind(cfg.data_root, seed=cfg.seed)


@dataclass
class DataBundle:
    tokenizer: object
    news: Dict[str, NewsCache]          # per split
    behaviors: Dict[str, Behaviors]     # per split
    user_num: int
    vocab_size: int


def build_data(cfg: Config, splits=("train", "dev"),
               process_index: int = 0) -> DataBundle:
    ensure_dataset(cfg)
    cache_base = os.path.join(cfg.cache_root, "MIND")

    backend = "word" if cfg.embedding in ("random", "glove") else cfg.bert
    # word backends persist a corpus word vocab (json); PLM backends a
    # trained WordPiece vocab (HF vocab.txt format). A real pretrained
    # vocab.txt dropped under {data_root}/vocab/ takes precedence so real
    # MIND runs emit HF-identical ids (see data/tokenizer.py resolution
    # order).
    if backend == "word":
        vocab_path = os.path.join(cache_base, "vocab", f"{cfg.scale}.json")
    else:
        vocab_path = os.path.join(cache_base, "vocab",
                                  f"{cfg.scale}_{backend}_wordpiece.txt")
    pretrained_vocab_paths = [
        os.path.join(cfg.data_root, "vocab", f"{backend}.txt"),
        os.path.join(cfg.data_root, "vocab", "vocab.txt"),
    ]
    train_news_tsv = os.path.join(split_dir(cfg, "train"), "news.tsv")
    corpus = None
    have_pretrained = backend != "word" and any(
        os.path.exists(p) for p in pretrained_vocab_paths)
    if not os.path.exists(vocab_path) and not have_pretrained:
        _, corpus = parse_news_tsv(train_news_tsv)
    tokenizer = get_tokenizer(backend, vocab_path=vocab_path, corpus=corpus,
                              pretrained_vocab_paths=pretrained_vocab_paths)

    news: Dict[str, NewsCache] = {}
    behaviors: Dict[str, Behaviors] = {}
    uid2idx = None
    for split in splits:
        d = split_dir(cfg, split)
        news_cache_dir = os.path.join(
            cache_base, "news", backend, f"{cfg.scale}_{split}")
        news[split] = build_news_cache(
            os.path.join(d, "news.tsv"), news_cache_dir, tokenizer,
            max_token_length=cfg.max_token_length,
            process_index=process_index)
        mode = "train" if split == "train" else \
            ("test" if split == "test" else "dev")
        beh_cache_dir = os.path.join(
            cache_base, "behaviors", f"{cfg.scale}_{split}")
        behaviors[split] = build_behaviors(
            os.path.join(d, "behaviors.tsv"), news[split].nid2idx, mode,
            impr_size=cfg.impr_size, uid2idx=uid2idx,
            cache_dir=beh_cache_dir, process_index=process_index)
        if uid2idx is None:
            uid2idx = behaviors[split].uid2idx
    # one-time cache sanity: the hot gathers use mode="clip", which would
    # silently clamp out-of-range ids — catch a stale cache (tokenized
    # with a different vocabulary) here instead
    for split, cache in news.items():
        top = int(np.max(cache.tokens)) if cache.tokens.size else 0
        if top >= tokenizer.vocab_size:
            raise ValueError(
                f"news token cache for split '{split}' holds id {top} >= "
                f"vocab_size {tokenizer.vocab_size}; the cache was built "
                f"with a different vocabulary — delete it and rebuild")
    return DataBundle(tokenizer=tokenizer, news=news, behaviors=behaviors,
                      user_num=len(uid2idx or {}),
                      vocab_size=tokenizer.vocab_size)


def load_pretrained_embedding(cfg: Config, data: DataBundle
                              ) -> Optional[np.ndarray]:
    """GloVe init matrix when --embedding glove and a glove file exists
    under {data_root}/glove/ (offline, file-based)."""
    if cfg.embedding != "glove":
        return None
    from .data.glove import find_glove_file, load_glove_matrix
    path = find_glove_file([os.path.join(cfg.data_root, "glove"),
                            cfg.data_root])
    if path is None:
        return None
    return load_glove_matrix(path, data.tokenizer, cfg.embedding_dim,
                             seed=cfg.seed)


def build_model(cfg: Config, vocab_size: int, user_num: int,
                pretrained_embedding: Optional[np.ndarray] = None,
                mesh=None):
    """Assemble the configured model family (twotower / plm / xformer).

    With a mesh whose 'model' axis is >1, the two-tower word table is
    row-sharded over it (parallel/sharded_embedding.py); the fused
    embedding→conv path and GloVe init apply only to the unsharded
    table."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    if cfg.model == "plm":
        from .models.bert import BertModel, bert_variant
        from .models.plm import PLM
        variant = bert_variant(cfg.bert, vocab_size=vocab_size,
                               signal_length=cfg.signal_length,
                               num_layers=cfg.bert_layers or None)
        if cfg.bert_dim != 768 and cfg.bert_dim != variant.hidden_size:
            # width override (--bert-dim): scale FFN and heads with it
            # (and re-derive head width from the new hidden size)
            variant = variant.replace(hidden_size=cfg.bert_dim,
                                      intermediate_size=4 * cfg.bert_dim,
                                      num_heads=cfg.head_num,
                                      attention_head_size=0)
        user_enc = make_user_encoder(cfg.encoderU,
                                     hidden_dim=variant.hidden_size,
                                     head_num=cfg.head_num,
                                     user_num=user_num, dtype=dtype)
        return PLM(bert=BertModel(variant, dtype=dtype),
                   user_encoder=user_enc, hidden_dim=variant.hidden_size,
                   debias=cfg.debias)
    if cfg.model == "xformer":
        from .models.bert import BertModel, bert_variant
        from .models.xformer import XFormer
        variant = bert_variant(cfg.bert, vocab_size=vocab_size,
                               signal_length=cfg.signal_length,
                               num_layers=cfg.bert_layers or None)
        if cfg.bert_dim != 768 and cfg.bert_dim != variant.hidden_size:
            variant = variant.replace(hidden_size=cfg.bert_dim,
                                      intermediate_size=4 * cfg.bert_dim,
                                      num_heads=cfg.head_num,
                                      attention_head_size=0)
        news_bert = None
        if cfg.bert == "reformer":
            news_variant = bert_variant("bert", vocab_size=vocab_size,
                                        signal_length=cfg.signal_length,
                                        num_layers=cfg.bert_layers or None)
            if cfg.bert_dim != 768:
                news_variant = news_variant.replace(
                    hidden_size=cfg.bert_dim,
                    intermediate_size=4 * cfg.bert_dim,
                    num_heads=cfg.head_num)
            news_bert = BertModel(news_variant, dtype=dtype)
        return XFormer(bert=BertModel(variant, dtype=dtype),
                       hidden_dim=variant.hidden_size,
                       max_length=variant.max_length,
                       max_length_per_history=variant.max_length_per_history,
                       news_bert=news_bert, debias=cfg.debias)
    model_axis = (mesh.shape.get("model", 1) if mesh is not None else 1)
    if model_axis > 1:
        from .parallel import ShardedWordEmbedding
        embedding = ShardedWordEmbedding(vocab_size, cfg.embedding_dim,
                                         mesh=mesh, dtype=dtype)
        news_enc = make_news_encoder(cfg.encoderN,
                                     hidden_dim=cfg.hidden_dim,
                                     embedding_dim=cfg.embedding_dim,
                                     head_num=cfg.head_num,
                                     dropout_p=cfg.dropout_p, dtype=dtype)
        user_enc = make_user_encoder(cfg.encoderU,
                                     hidden_dim=cfg.hidden_dim,
                                     head_num=cfg.head_num,
                                     user_num=user_num, dtype=dtype)
        return TwoTower(embedding=embedding, news_encoder=news_enc,
                        user_encoder=user_enc, hidden_dim=cfg.hidden_dim)
    if cfg.encoderN == "cnn" and cfg.fused_embedding:
        # exact algebraic fusion of lookup+conv (FusedCnnNewsEncoder
        # docstring): ~55x fewer conv FLOPs at reference shapes
        from .models.news_encoders import FusedCnnNewsEncoder
        news_enc = FusedCnnNewsEncoder(vocab_size, cfg.embedding_dim,
                                       cfg.hidden_dim,
                                       pretrained=pretrained_embedding,
                                       dtype=dtype)
        user_enc = make_user_encoder(cfg.encoderU,
                                     hidden_dim=cfg.hidden_dim,
                                     head_num=cfg.head_num,
                                     user_num=user_num, dtype=dtype)
        return TwoTower(embedding=None, news_encoder=news_enc,
                        user_encoder=user_enc, hidden_dim=cfg.hidden_dim)
    embedding = WordEmbedding(vocab_size, cfg.embedding_dim,
                              pretrained=pretrained_embedding, dtype=dtype)
    news_enc = make_news_encoder(cfg.encoderN, hidden_dim=cfg.hidden_dim,
                                 embedding_dim=cfg.embedding_dim,
                                 head_num=cfg.head_num,
                                 dropout_p=cfg.dropout_p, dtype=dtype)
    user_enc = make_user_encoder(cfg.encoderU, hidden_dim=cfg.hidden_dim,
                                 head_num=cfg.head_num, user_num=user_num,
                                 dtype=dtype)
    return TwoTower(embedding=embedding, news_encoder=news_enc,
                    user_encoder=user_enc, hidden_dim=cfg.hidden_dim)


def _read_local_state_dict(path: str):
    """Load a HF checkpoint file (pytorch_model.bin or model.safetensors)
    into a {name: ndarray} dict without any network access."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def find_hf_checkpoint(cfg: Config,
                       variant: Optional[str] = None) -> Optional[str]:
    """Path of a locally cached HF checkpoint for cfg.bert, if present.

    Searched under ``{data_root}/hf/{variant}/`` (drop the files there by
    hand in zero-egress environments) — the file-based counterpart of the
    reference's AutoModel.from_pretrained downloads
    (reference models/PLM.py:21-84)."""
    base = os.path.join(cfg.data_root, "hf", variant or cfg.bert)
    for name in ("model.safetensors", "pytorch_model.bin"):
        p = os.path.join(base, name)
        if os.path.exists(p):
            return p
    return None


# variant → (state-dict mapper, HF submodule prefix to strip)
_HF_LOADERS = {
    "bert": ("load_hf_bert_weights", "bert."),
    "newsbert": ("load_hf_bert_weights", "bert."),
    # synthesizer: BERT weights land where paths exist; the score MLP has
    # no pretrained counterpart and keeps random init (strict=False, like
    # reference models/PLM.py:40-48)
    "synthesizer": ("load_hf_bert_weights", "bert."),
    # bigbird's HF state dict uses BERT layer naming; the position table
    # is sliced to our max_position before mapping
    "bigbird": ("load_hf_bert_weights", "bert."),
    "distill": ("load_hf_distilbert_weights", "distilbert."),
    "deberta": ("load_hf_deberta_weights", "deberta."),
    "longformer": ("load_hf_longformer_weights", "longformer."),
    # funnel: structural import — per-block content projections, norms,
    # FFN and embeddings map; Transformer-XL relative/segment terms have
    # no counterpart (documented per-weight in load_hf_funnel_weights)
    "funnel": ("load_hf_funnel_weights", "funnel."),
    # reformer: structural import — tied-q/k LSH + local-layer
    # projections, FFN, norms and axial position halves map
    # shape-exactly (the variant mirrors crime-and-punishment's
    # 2×64-head / 512-FFN dims); the 2H reversible output norm and (for
    # the wordpiece pipeline) the 320-entry SentencePiece word table
    # have no slot — per-weight ledger in load_hf_reformer_weights
    "reformer": ("load_hf_reformer_weights", "reformer."),
}


def maybe_load_hf_weights(cfg: Config, params, verbose: bool = True):
    """Initialise PLM/XFormer BERT towers from a locally cached HF
    checkpoint when one exists. Returns (params, loaded: bool)."""
    if cfg.model not in ("plm", "xformer") or cfg.bert not in _HF_LOADERS:
        return params, False
    path = find_hf_checkpoint(cfg)
    if path is None:
        return params, False
    from .models import bert as bert_mod
    fn_name, prefix = _HF_LOADERS[cfg.bert]
    loader = getattr(bert_mod, fn_name)
    sd = _read_local_state_dict(path)
    # bare *Model state dicts carry no submodule prefix; full-model ones do
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""
    if cfg.bert == "bigbird":
        key = prefix + "embeddings.position_embeddings.weight"
        if key in sd:
            sd = dict(sd)
            sd[key] = np.asarray(sd[key])[: _plm_max_position(cfg)]
    tree = flax_unfreeze_params(params)
    n_placed = 0
    for tower in ("bert", "news_bert"):
        if tower not in tree["params"]:
            continue
        t_loader, t_prefix, t_sd = loader, prefix, sd
        if tower == "news_bert" and cfg.bert == "reformer":
            # the reference's XFormer-reformer pairs a RANDOM-init
            # reformer user tower with a PRETRAINED bert-base news tower
            # (models/XFormer.py:24-27); the news tower therefore pulls
            # from the hf/bert checkpoint, not the reformer one
            bert_path = find_hf_checkpoint(cfg, variant="bert")
            if bert_path is None:
                continue
            t_sd = _read_local_state_dict(bert_path)
            t_loader = bert_mod.load_hf_bert_weights
            t_prefix = ("bert." if any(k.startswith("bert.")
                                       for k in t_sd) else "")
        n_layers = sum(1 for k in tree["params"][tower]
                       if k.startswith("layer_"))
        sub, placed = t_loader({"params": tree["params"][tower]}, t_sd,
                               num_layers=n_layers, prefix=t_prefix)
        tree["params"][tower] = sub["params"]
        n_placed += placed
    import logging
    log = logging.getLogger("news_recommendation_mind_tpu")
    if n_placed == 0:
        # every tensor was skipped by the shape guard (e.g. checkpoint
        # width != cfg.bert_dim) — training would silently proceed from
        # random init while claiming pretrained init; report honestly
        log.warning(
            "HF checkpoint %s matched 0 tensors for %s (shape/path "
            "mismatch); keeping random init", path, cfg.bert)
        return params, False
    if verbose:
        log.info(
            "initialised %s tower(s) from local HF checkpoint %s "
            "(%d tensors placed)", cfg.bert, path, n_placed)
    return tree, True


def _plm_max_position(cfg: Config) -> int:
    from .models.bert import bert_variant
    return bert_variant(cfg.bert).max_position


def flax_unfreeze_params(params):
    from .models.bert import flax_unfreeze
    return flax_unfreeze(params)


def build_train_loader(cfg: Config, data: DataBundle,
                       num_shards: int = 1, shard_index: int = 0,
                       emit_tokens: Optional[bool] = None) -> TrainLoader:
    if emit_tokens is None:
        emit_tokens = not cfg.device_gather
    # xformer consumes raw concatenated history tokens — news-level
    # dedup only applies to the news-tower families; the row-sharded
    # table's shard_map lookup needs data-sharded per-example ids, so
    # dedup is off under model parallelism
    dedup = (cfg.dedup_news and cfg.model in ("twotower", "plm")
             and cfg.model_parallel <= 1)
    return TrainLoader(
        data.news["train"], data.behaviors["train"],
        batch_size=cfg.batch_size, npratio=cfg.npratio,
        his_size=cfg.his_size, signal_length=cfg.signal_length,
        shuffle_pos=cfg.shuffle_pos, descend_history=cfg.descend_history,
        seed=cfg.seed, num_shards=num_shards, shard_index=shard_index,
        emit_tokens=emit_tokens, dedup=dedup)


def build_eval_loaders(cfg: Config, data: DataBundle, split: str = "dev",
                       num_shards: int = 1, shard_index: int = 0):
    # the phase-1 news sweep is sharded like the impression partition:
    # each process encodes a contiguous 1/P of the corpus and the table
    # is allgathered (evaluation/engine.py encode_all_news)
    news_loader = NewsLoader(data.news[split],
                             batch_size=cfg.batch_size_news,
                             signal_length=cfg.signal_length,
                             num_shards=num_shards,
                             shard_index=shard_index)
    eval_loader = EvalLoader(
        data.news[split], data.behaviors[split],
        batch_size=max(cfg.batch_size, 8), his_size=cfg.his_size,
        signal_length=cfg.signal_length,
        descend_history=cfg.descend_history, impr_size=cfg.impr_size,
        num_shards=num_shards, shard_index=shard_index,
        include_cdd_tokens=not cfg.fast)
    return news_loader, eval_loader


def build_history_loader(cfg: Config, data: DataBundle,
                         split: str = "dev") -> HistoryLoader:
    return HistoryLoader(data.news[split], data.behaviors[split],
                         batch_size=cfg.batch_size_history,
                         his_size=cfg.his_size,
                         signal_length=cfg.signal_length,
                         descend_history=cfg.descend_history)
