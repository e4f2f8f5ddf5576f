"""PLM model family: a full language model as the news encoder.

Capability parity with the reference PLM (reference models/PLM.py:8-132):
candidate and history articles are flattened to [B*N, S] and pushed through
the PLM in one batch (the MXU-friendly layout — one big pass instead of N
small ones); the pooled output is the news representation; any user
encoder from user_encoders.py aggregates history; optional learned user
bias (--debias, reference models/PLM.py:15-17, 129-130). The fast-eval
history short-circuit (reference models/PLM.py:110-113) is
``encode_user_from_reprs`` — shared with TwoTower so the eval engine
treats both identically.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from .bert import BertModel

Batch = Dict[str, jnp.ndarray]


class PLM(nn.Module):
    """PLM news encoder + configurable user encoder, TwoTower interface."""
    bert: BertModel
    user_encoder: nn.Module
    hidden_dim: int
    debias: bool = False
    fast_user_from_table: bool = True

    def setup(self):
        if self.debias:
            self.user_bias = self.param(
                "user_bias", nn.initializers.xavier_normal(),
                (1, self.hidden_dim), jnp.float32)

    def encode_news(self, tokens: jnp.ndarray, attn_mask: jnp.ndarray,
                    deterministic: bool = True) -> jnp.ndarray:
        """[B, N, S] → [B, N, H] pooled PLM outputs
        (reference models/PLM.py:93-107)."""
        B, N, S = tokens.shape
        _, pooled = self.bert(tokens.reshape(B * N, S),
                              attn_mask.reshape(B * N, S),
                              deterministic=deterministic)
        return pooled.reshape(B, N, self.hidden_dim)

    def _user_bias(self, user_repr: jnp.ndarray) -> jnp.ndarray:
        if not self.debias:
            return user_repr
        return user_repr + self.user_bias.astype(user_repr.dtype)[None]

    def encode_user(self, his_tokens: jnp.ndarray, his_attn: jnp.ndarray,
                    his_mask: jnp.ndarray,
                    user_id: Optional[jnp.ndarray] = None,
                    deterministic: bool = True) -> jnp.ndarray:
        """Live path: one PLM pass per history article, batched as
        [B*his, S] (the hot cost, reference models/PLM.py:117-126)."""
        his_repr = self.encode_news(his_tokens, his_attn, deterministic)
        user_repr = self.user_encoder(his_repr, his_mask=his_mask,
                                      user_id=user_id,
                                      deterministic=deterministic)
        return self._user_bias(user_repr)

    def encode_user_from_reprs(self, his_repr: jnp.ndarray,
                               his_mask: jnp.ndarray,
                               user_id: Optional[jnp.ndarray] = None,
                               deterministic: bool = True) -> jnp.ndarray:
        """Fast path: history reprs from the cached news table
        (reference models/PLM.py:110-113)."""
        user_repr = self.user_encoder(his_repr, his_mask=his_mask,
                                      user_id=user_id,
                                      deterministic=deterministic)
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
