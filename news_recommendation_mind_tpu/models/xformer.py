"""XFormer: the one-tower long-context user model.

Capability parity with the reference XFormer (reference
models/XFormer.py:8-100): the user is encoded by concatenating the first
``max_length_per_history`` tokens of every history article (dropping each
article's [CLS]) into one long sequence capped at ``max_length``, keeping a
single leading [CLS], and running ONE PLM pass — the reference's
long-context story (SURVEY §5.7). Long variants use the local+global
windowed attention in bert.py (Longformer w=32 / BigBird block 64 /
Reformer chunked — reference models/PLM.py:66-78, models/XFormer.py:18-42).

The reformer variant keeps the reference's asymmetric towers: a standard
encoder for candidates projected into the reformer width, and a 2-layer
dropout pooler on the user side (reference models/XFormer.py:18-42).

All concat/slice logic is static-shape jnp (reshape + slice), so it
compiles once and stays on-device.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .bert import BertModel

Batch = Dict[str, jnp.ndarray]


def concat_history_tokens(his_tokens: jnp.ndarray, his_attn: jnp.ndarray,
                          per_history: int, max_length: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, N, S] histories → one [B, max_length] token sequence.

    Keeps history[0]'s [CLS], then the first `per_history` non-CLS tokens
    of every article, truncated to max_length
    (reference models/XFormer.py:78-90). Static shapes: output is padded
    to exactly max_length.
    """
    B, N, S = his_tokens.shape
    k = min(per_history, S - 1)
    cls_tok = his_tokens[:, 0, 0:1]
    cls_mask = his_attn[:, 0, 0:1]
    body = his_tokens[:, :, 1:k + 1].reshape(B, N * k)[:, :max_length - 1]
    body_mask = his_attn[:, :, 1:k + 1].reshape(B, N * k)[:, :max_length - 1]
    toks = jnp.concatenate([cls_tok, body], axis=1)
    mask = jnp.concatenate([cls_mask, body_mask], axis=1)
    pad = max_length - toks.shape[1]
    if pad > 0:
        toks = jnp.pad(toks, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    return toks, mask


class XFormer(nn.Module):
    """One-tower model with the TwoTower scoring interface."""
    bert: BertModel                     # user-side (and default news) PLM
    hidden_dim: int
    max_length: int
    max_length_per_history: int
    news_bert: Optional[BertModel] = None  # reformer: separate news tower
    debias: bool = False
    fast_user_from_table: bool = False  # user enc needs raw tokens

    def setup(self):
        if self.debias:
            self.user_bias = self.param(
                "user_bias", nn.initializers.xavier_normal(),
                (1, self.hidden_dim), jnp.float32)
        if self.news_bert is not None:
            # reformer asymmetric towers (reference models/XFormer.py:18-42)
            self.projector = nn.Dense(self.hidden_dim, name="projector")
            self.user_pool_in = nn.Dense(self.hidden_dim,
                                         name="user_pool_in")
            self.user_pool_out = nn.Dense(self.hidden_dim,
                                          name="user_pool_out")
            self.user_pool_drop = nn.Dropout(0.05)

    def encode_news(self, tokens: jnp.ndarray, attn_mask: jnp.ndarray,
                    deterministic: bool = True) -> jnp.ndarray:
        """[B, N, S] → [B, N, H] pooled (reference models/XFormer.py:59-76);
        reformer projects the 768-wide news tower into reformer width."""
        B, N, S = tokens.shape
        tower = self.news_bert if self.news_bert is not None else self.bert
        _, pooled = tower(tokens.reshape(B * N, S),
                          attn_mask.reshape(B * N, S),
                          deterministic=deterministic)
        if self.news_bert is not None:
            pooled = self.projector(pooled)
        return pooled.reshape(B, N, self.hidden_dim)

    def _user_bias(self, user_repr: jnp.ndarray) -> jnp.ndarray:
        if not self.debias:
            return user_repr
        return user_repr + self.user_bias.astype(user_repr.dtype)[None]

    def encode_user(self, his_tokens: jnp.ndarray, his_attn: jnp.ndarray,
                    his_mask: jnp.ndarray,
                    user_id: Optional[jnp.ndarray] = None,
                    deterministic: bool = True) -> jnp.ndarray:
        toks, mask = concat_history_tokens(
            his_tokens, his_attn, self.max_length_per_history,
            self.max_length)
        hidden, pooled = self.bert(toks, mask, deterministic=deterministic)
        if self.news_bert is not None:
            # reformer pooler: 2-layer MLP with dropout on [CLS] hidden
            # (reference models/XFormer.py:29-35, 92-93). The reference
            # feeds hidden_size*2 because reformer outputs reversible
            # concat; our encoder is width-H so the pooler is H→H.
            x = self.user_pool_drop(hidden[:, 0], deterministic=deterministic)
            x = jnp.tanh(self.user_pool_in(x))
            x = self.user_pool_drop(x, deterministic=deterministic)
            pooled = self.user_pool_out(x)
        user_repr = pooled[:, None, :]
        return self._user_bias(user_repr)

    def compute_score(self, cdd_repr: jnp.ndarray,
                      user_repr: jnp.ndarray) -> jnp.ndarray:
        d = jnp.asarray(cdd_repr.shape[-1], cdd_repr.dtype)
        return jnp.einsum("bch,buh->bc", cdd_repr, user_repr) / jnp.sqrt(d)

    def __call__(self, batch: Batch,
                 deterministic: bool = True) -> jnp.ndarray:
        cdd_repr = self.encode_news(batch["cdd_token"], batch["cdd_attn"],
                                    deterministic)
        user_repr = self.encode_user(batch["his_token"], batch["his_attn"],
                                     batch["his_mask"],
                                     batch.get("user_id"), deterministic)
        return self.compute_score(cdd_repr, user_repr)
