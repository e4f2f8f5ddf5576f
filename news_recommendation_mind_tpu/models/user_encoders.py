"""User encoders: history news reprs [B, N, H] (+ his_mask [B, N],
user_id [B]) → user representation [B, 1, H].

TPU-native counterparts of the reference Encoders/ user-side modules:

- ``RnnUserEncoder``   (reference models/Encoders/RNN.py:36-73): LSTM/GRU
  with orthogonal weights; variable lengths handled by mask-frozen scan
  state instead of pack_padded_sequence — the final carry equals the
  hidden state at each row's last valid step.
- ``LsturUserEncoder`` (reference models/Encoders/RNN.py:76-104): user-id
  embedding (dropped with p=0.5 Bernoulli during training) seeds the LSTM
  hidden state; history is processed *reversed and unmasked*, matching the
  reference exactly.
- ``MhaUserEncoder``   (reference models/Encoders/MHA.py:42-75) — with the
  pooling mask correctly oriented [B, 1, N] (the reference passes
  his_mask [B, N, 1] raw, which broadcasts wrongly; not reproduced).
- ``AttentionPooling`` / ``AveragePooling`` (reference
  models/Encoders/Pooling.py:5-43); AveragePooling uses a *masked* mean
  (the reference averages pad-article reprs in — not reproduced).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.rnn import gru_scan, lstm_scan
from .attention import MultiheadAttention, make_attn_mask, scaled_dp_attention

xavier = nn.initializers.xavier_normal


def _rnn_params(mod: nn.Module, name: str, in_dim: int, hidden: int,
                gates: int, dtype) -> dict:
    return {
        "w_ih": mod.param(f"{name}_w_ih", nn.initializers.orthogonal(),
                          (in_dim, gates * hidden), jnp.float32).astype(dtype),
        "w_hh": mod.param(f"{name}_w_hh", nn.initializers.orthogonal(),
                          (hidden, gates * hidden), jnp.float32).astype(dtype),
        "b_ih": mod.param(f"{name}_b_ih", nn.initializers.zeros,
                          (gates * hidden,), jnp.float32).astype(dtype),
        "b_hh": mod.param(f"{name}_b_hh", nn.initializers.zeros,
                          (gates * hidden,), jnp.float32).astype(dtype),
    }


class RnnUserEncoder(nn.Module):
    """LSTM/GRU over history; user repr = final hidden state."""
    hidden_dim: int
    cell: str = "lstm"  # lstm | gru
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, news_repr: jnp.ndarray,
                 his_mask: Optional[jnp.ndarray] = None,
                 user_id: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        x = news_repr.astype(self.dtype)
        if self.cell == "gru":
            p = _rnn_params(self, "gru", self.hidden_dim, self.hidden_dim,
                            3, self.dtype)
            _, h = gru_scan(p, x, mask=his_mask)
        else:
            p = _rnn_params(self, "lstm", self.hidden_dim, self.hidden_dim,
                            4, self.dtype)
            _, h, _ = lstm_scan(p, x, mask=his_mask)
        return h[:, None, :]


class LsturUserEncoder(nn.Module):
    """LSTUR: long-term user embedding as LSTM h0 over reversed history.

    During training the user embedding is zeroed with probability 0.5 per
    sample (long-term-repr dropout, reference models/Encoders/RNN.py:95-100
    — the reference applies it in eval too; here it is train-only).
    Row 0 of the user table is the pad/cold user.
    """
    hidden_dim: int
    user_num: int
    mask_p: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, news_repr: jnp.ndarray,
                 his_mask: Optional[jnp.ndarray] = None,
                 user_id: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        B = news_repr.shape[0]
        if user_id is None:
            user_id = jnp.zeros((B,), jnp.int32)
        table = self.param(
            "user_embedding",
            lambda key, shape, dtype: nn.initializers.normal(0.02)(
                key, shape, dtype).at[0].set(0.0),
            (self.user_num + 1, self.hidden_dim), jnp.float32)
        if not deterministic:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.mask_p, (B,))
            user_id = jnp.where(keep, user_id, 0)
        h0 = jnp.take(table, user_id, axis=0).astype(self.dtype)
        p = _rnn_params(self, "lstm", self.hidden_dim, self.hidden_dim,
                        4, self.dtype)
        # reversed, unmasked — matches reference flip(dims=[1]) + full pass
        x = jnp.flip(news_repr.astype(self.dtype), axis=1)
        _, h, _ = lstm_scan(p, x, h0=h0)
        return h[:, None, :]


class MhaUserEncoder(nn.Module):
    """Self-attention over history reprs + learned-query pooling."""
    hidden_dim: int
    head_num: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, news_repr: jnp.ndarray,
                 his_mask: Optional[jnp.ndarray] = None,
                 user_id: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        assert self.hidden_dim % self.head_num == 0
        mha = MultiheadAttention(
            head_num=self.head_num,
            key_dim=self.hidden_dim // self.head_num,
            value_dim=self.hidden_dim // self.head_num, dtype=self.dtype)
        x = news_repr.astype(self.dtype)
        self_mask = make_attn_mask(his_mask) if his_mask is not None else None
        x = mha(x, self_mask)
        query = self.param("query_news", nn.initializers.normal(1.0),
                           (1, self.hidden_dim), jnp.float32).astype(self.dtype)
        pool_mask = his_mask[:, None, :] if his_mask is not None else None
        return scaled_dp_attention(query, x, x, pool_mask)


class AttentionPooling(nn.Module):
    """Learned-query attention pooling over history reprs."""
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, news_repr: jnp.ndarray,
                 his_mask: Optional[jnp.ndarray] = None,
                 user_id: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        query = self.param("query_news", xavier(), (1, self.hidden_dim),
                           jnp.float32).astype(self.dtype)
        x = news_repr.astype(self.dtype)
        pool_mask = his_mask[:, None, :] if his_mask is not None else None
        return scaled_dp_attention(query, x, x, pool_mask)


class AveragePooling(nn.Module):
    """Masked mean over valid history items."""
    hidden_dim: int = 0  # unused; uniform factory signature
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, news_repr: jnp.ndarray,
                 his_mask: Optional[jnp.ndarray] = None,
                 user_id: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        x = news_repr.astype(self.dtype)
        if his_mask is None:
            return x.mean(axis=1, keepdims=True)
        m = his_mask.astype(self.dtype)[..., None]
        return (x * m).sum(axis=1, keepdims=True) / jnp.maximum(
            m.sum(axis=1, keepdims=True), 1.0)


def make_user_encoder(name: str, *, hidden_dim: int, head_num: int,
                      user_num: int = 0, dtype=jnp.float32) -> nn.Module:
    """Factory keyed by the --encoderU flag (reference utils/Manager.py:94)."""
    if name in ("lstm", "gru"):
        return RnnUserEncoder(hidden_dim, cell=name, dtype=dtype)
    if name == "lstur":
        return LsturUserEncoder(hidden_dim, user_num=user_num, dtype=dtype)
    if name == "mha":
        return MhaUserEncoder(hidden_dim, head_num, dtype=dtype)
    if name in ("attn", "attention"):
        return AttentionPooling(hidden_dim, dtype=dtype)
    if name in ("avg", "average"):
        return AveragePooling(hidden_dim, dtype=dtype)
    raise ValueError(f"unknown user encoder {name}")
