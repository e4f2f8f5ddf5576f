"""News encoders: token embeddings [B, N, S, E] → (token hidden [B, N, S, H],
news representation [B, N, H]).

TPU-native counterparts of the reference Encoders/ news-side modules. All
fold the news axis N into the batch so every op sees one large
MXU-friendly [B*N, S, ·] problem, then unfold at the end:

- ``CnnNewsEncoder``         (reference models/Encoders/CNN.py:12-50)
- ``MhaNewsEncoder``         (reference models/Encoders/MHA.py:5-39, NRMS)
- ``TransformerNewsEncoder`` (reference models/Encoders/Transformer.py:8-39
  + the single BertLayer of models/Modules/OneLayerBert.py:106-133, which
  is *single-head* full-width attention)
- ``RnnNewsEncoder``         (reference models/Encoders/RNN.py:5-33, BiLSTM)
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.rnn import lstm_scan
from .attention import MultiheadAttention, make_attn_mask, scaled_dp_attention

xavier = nn.initializers.xavier_normal


def _query_pool(query: jnp.ndarray, keys: jnp.ndarray, values: jnp.ndarray,
                attn_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Learned-query attention pooling over the token axis.
    query [1, H]; keys/values [..., S, H]; attn_mask [..., S] → [..., H]."""
    if attn_mask is not None:
        attn_mask = attn_mask[..., None, :]  # [..., 1(query), S]
    return scaled_dp_attention(query, keys, values, attn_mask)[..., 0, :]


class CnnNewsEncoder(nn.Module):
    """Conv1d(k=3) + ReLU + tanh-projected query attention pooling."""
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jnp.ndarray,
                 attn_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, N, S, E = emb.shape
        x = emb.reshape(B * N, S, E)
        x = nn.Conv(self.hidden_dim, kernel_size=(3,), padding="SAME",
                    dtype=self.dtype, kernel_init=xavier())(x)
        x = nn.relu(x).reshape(B, N, S, self.hidden_dim)
        query = self.param("query_words", xavier(), (1, self.hidden_dim),
                           jnp.float32).astype(self.dtype)
        keys = jnp.tanh(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 kernel_init=xavier(),
                                 name="word_query_project")(x))
        repr_ = _query_pool(query, keys, x, attn_mask)
        return x, repr_


class MhaNewsEncoder(nn.Module):
    """Multi-head self-attention (shared QK projection) + LayerNorm +
    dropout + query pooling. NRMS-style."""
    hidden_dim: int
    embedding_dim: int
    head_num: int
    dropout_p: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jnp.ndarray,
                 attn_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert self.hidden_dim % self.head_num == 0
        value_dim = self.hidden_dim // self.head_num
        key_dim = self.embedding_dim // self.head_num
        mha = MultiheadAttention(head_num=self.head_num, key_dim=key_dim,
                                 value_dim=value_dim, dtype=self.dtype)
        self_mask = make_attn_mask(attn_mask) if attn_mask is not None else None
        x = mha(emb, self_mask)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout_p, deterministic=deterministic)(x)
        query = self.param("query_words", nn.initializers.normal(1.0),
                           (1, self.hidden_dim), jnp.float32).astype(self.dtype)
        repr_ = _query_pool(query, x, x, attn_mask)
        return x, repr_


class BertLayer(nn.Module):
    """One BERT layer at width H with *single-head* attention
    (reference models/Modules/OneLayerBert.py: q/k/v are full-width Dense
    with no head split), 4H GELU FFN, post-LN residuals (eps 1e-12)."""
    hidden_dim: int
    dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: Optional[jnp.ndarray],
                 deterministic: bool = True) -> jnp.ndarray:
        H = self.hidden_dim
        q = nn.Dense(H, dtype=self.dtype, name="query")(x)
        k = nn.Dense(H, dtype=self.dtype, name="key")(x)
        v = nn.Dense(H, dtype=self.dtype, name="value")(x)
        scores = jnp.einsum("...qd,...kd->...qk", q, k) / jnp.sqrt(
            jnp.asarray(H, self.dtype))
        from .attention import masked_softmax
        probs = masked_softmax(scores, attn_mask)
        probs = nn.Dropout(self.dropout_p, deterministic=deterministic)(probs)
        ctx = jnp.einsum("...qk,...kv->...qv", probs, v)
        ctx = nn.Dense(H, dtype=self.dtype, name="attn_out")(ctx)
        ctx = nn.Dropout(self.dropout_p, deterministic=deterministic)(ctx)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)(x + ctx)
        ff = nn.gelu(nn.Dense(4 * H, dtype=self.dtype, name="ffn_in")(x))
        ff = nn.Dense(H, dtype=self.dtype, name="ffn_out")(ff)
        ff = nn.Dropout(self.dropout_p, deterministic=deterministic)(ff)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)(x + ff)


class TransformerNewsEncoder(nn.Module):
    """Linear E→H projection + one BertLayer + query attention pooling."""
    hidden_dim: int
    dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jnp.ndarray,
                 attn_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, N, S, E = emb.shape
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="project")(
            emb.reshape(B * N, S, E))
        key_mask = (attn_mask.reshape(B * N, S)[..., None, :]
                    if attn_mask is not None else None)  # keys-only masking
        x = BertLayer(self.hidden_dim, self.dropout_p, self.dtype)(
            x, key_mask, deterministic)
        query = self.param("query_words", xavier(), (1, self.hidden_dim),
                           jnp.float32).astype(self.dtype)
        x = x.reshape(B, N, S, self.hidden_dim)
        repr_ = _query_pool(query, x, x, attn_mask)
        return x, repr_


class RnnNewsEncoder(nn.Module):
    """BiLSTM over tokens; token hidden = mean of directions, news repr =
    mean of the two final states (reference models/Encoders/RNN.py:5-33,
    which runs without length masking — reproduced)."""
    hidden_dim: int
    embedding_dim: int
    dtype: jnp.dtype = jnp.float32

    def _lstm_params(self, name: str, in_dim: int):
        H = self.hidden_dim
        return {
            "w_ih": self.param(f"{name}_w_ih", nn.initializers.orthogonal(),
                               (in_dim, 4 * H), jnp.float32).astype(self.dtype),
            "w_hh": self.param(f"{name}_w_hh", nn.initializers.orthogonal(),
                               (H, 4 * H), jnp.float32).astype(self.dtype),
            "b_ih": self.param(f"{name}_b_ih", nn.initializers.zeros,
                               (4 * H,), jnp.float32).astype(self.dtype),
            "b_hh": self.param(f"{name}_b_hh", nn.initializers.zeros,
                               (4 * H,), jnp.float32).astype(self.dtype),
        }

    @nn.compact
    def __call__(self, emb: jnp.ndarray,
                 attn_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, N, S, E = emb.shape
        x = emb.reshape(B * N, S, E).astype(self.dtype)
        fwd, h_f, _ = lstm_scan(self._lstm_params("fwd", E), x)
        bwd, h_b, _ = lstm_scan(self._lstm_params("bwd", E), x, reverse=True)
        tokens = ((fwd + bwd) / 2).reshape(B, N, S, self.hidden_dim)
        repr_ = ((h_f + h_b) / 2).reshape(B, N, self.hidden_dim)
        return tokens, repr_


def make_news_encoder(name: str, *, hidden_dim: int, embedding_dim: int,
                      head_num: int, dropout_p: float,
                      dtype=jnp.float32) -> nn.Module:
    """Factory keyed by the --encoderN flag (reference utils/Manager.py:93)."""
    if name == "cnn":
        return CnnNewsEncoder(hidden_dim, dtype=dtype)
    if name == "mha":
        return MhaNewsEncoder(hidden_dim, embedding_dim, head_num,
                              dropout_p, dtype=dtype)
    if name == "transformer":
        return TransformerNewsEncoder(hidden_dim, dropout_p, dtype=dtype)
    if name == "rnn":
        return RnnNewsEncoder(hidden_dim, embedding_dim, dtype=dtype)
    raise ValueError(f"unknown news encoder {name}")
