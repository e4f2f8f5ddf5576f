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

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rnn import lstm_scan
from .attention import MultiheadAttention, make_attn_mask, scaled_dp_attention

xavier = nn.initializers.xavier_normal


@jax.custom_vjp
def _selector_shift_add(z: jnp.ndarray) -> jnp.ndarray:
    """SAME-pad tap-select sum: y[s] = z[s-1, block0] + z[s, block1] +
    z[s+1, block2], for z [T, S, 3H] → y [T, S, H].

    Forward rides the MXU as a conv with a constant block-selector kernel
    (2.8x faster than VPU shift-adds at flagship shapes). Backward builds
    dz directly as three shifted copies of dy — the autodiff route
    (transposed conv) forces a [T, S, 3H] layout copy + reshape in front
    of the embedding-gradient scatter (~10ms/step of pure data movement
    on the v5e flagship bench); the slice form fuses into the scatter's
    payload computation.
    """
    H = z.shape[-1] // 3
    sel = np.zeros((3, 3 * H, H), np.float32)
    for k in range(3):
        sel[k, k * H:(k + 1) * H, :] = np.eye(H)
    return jax.lax.conv_general_dilated(
        z, jnp.asarray(sel, z.dtype), (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))


def _selector_shift_add_fwd(z):
    return _selector_shift_add(z), None


def _selector_shift_add_bwd(_, dy):
    # y[s] touches z[s-1] tap0, z[s] tap1, z[s+1] tap2 →
    # dz[s] = [dy[s+1], dy[s], dy[s-1]] along the feature axis
    S = dy.shape[-2]
    dyp = jnp.pad(dy, ((0, 0), (1, 1), (0, 0)))
    dz = jnp.concatenate([dyp[:, 2:], dy, dyp[:, :S]], axis=-1)
    return (dz,)


_selector_shift_add.defvjp(_selector_shift_add_fwd, _selector_shift_add_bwd)


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


class FusedCnnNewsEncoder(nn.Module):
    """CNN news encoder with the embedding lookup fused through the conv.

    The standard path (WordEmbedding + CnnNewsEncoder) is
    take(table, ids) → Conv1d(k=3, SAME) → ReLU → query pooling. Both the
    lookup and the conv are linear in the one-hot token, so the conv can
    be pre-applied to the *vocabulary* instead of to every token
    occurrence: P = einsum('ve,keh->vkh', table, kernel) → [V, 3, H];
    token s then needs one 3H-wide gather plus a shift-add
    (y[s] = P[ids[s-1], 0] + P[ids[s], 1] + P[ids[s+1], 2] + bias).

    At reference shapes (batch 1024 × 55 news × 30 tokens ≈ 1.7M token
    occurrences/step vs V≈30k vocabulary rows) this moves the conv's
    ~1.2 TFLOP/step from the token domain to a 21 GFLOP/step vocabulary
    matmul (55x fewer FLOPs) and shrinks the gather and its
    scatter-add gradient from 768-wide fp32 rows to 450-wide rows. It is
    mathematically exact — no dropout or nonlinearity sits between the
    table and the conv (the reference applies none either:
    models/Encoders/CNN.py:12-24 convolves the raw embedding output).

    Parameter names mirror the unfused pair (`embedding`, conv
    `kernel`/`bias`, pooling `query_words`/`word_query_project`);
    ``fuse_cnn_params``/``unfuse_cnn_params`` below convert param trees
    both ways so checkpoints are interchangeable.
    """
    vocab_size: int
    embedding_dim: int
    hidden_dim: int
    pretrained: Optional[Any] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray,
                 attn_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, N, S = tokens.shape
        V, E, H = self.vocab_size, self.embedding_dim, self.hidden_dim
        if self.pretrained is not None:
            emb_init = lambda key, shape, dtype: jnp.asarray(
                self.pretrained, dtype)
        else:
            emb_init = nn.initializers.normal(stddev=0.02)
        table = self.param("embedding", emb_init, (V, E), jnp.float32)
        kernel = self.param("kernel", xavier(), (3, E, H), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (H,), jnp.float32)
        # project the vocabulary through the 3 conv taps once per step
        proj = jnp.einsum(
            "ve,keh->vkh", table, kernel,
            preferred_element_type=jnp.float32).astype(self.dtype)
        # token ids are valid by construction; mode="clip" skips the
        # out-of-bounds fill-select XLA emits for the default mode
        # (measured 5%/step on the v5e flagship bench)
        z = jnp.take(proj.reshape(V, 3 * H), tokens.reshape(B * N, S),
                     axis=0, mode="clip")              # [B*N, S, 3H]
        x = _selector_shift_add(z)
        x = nn.relu(x + bias.astype(self.dtype))          # [B*N, S, H]
        query = self.param("query_words", xavier(), (1, H),
                           jnp.float32).astype(self.dtype)
        keys = jnp.tanh(nn.Dense(H, dtype=self.dtype, kernel_init=xavier(),
                                 name="word_query_project")(x))
        # pool in the flat [B*N, S, H] domain: unfolding to [B, N, S, H]
        # first forces layout copies of the 512MB token-domain tensors
        # (the conv prefers batch-minor); flat pooling reshapes only the
        # [B*N, H] reprs (12%/step on the v5e flagship bench)
        flat_mask = (attn_mask.reshape(B * N, S)
                     if attn_mask is not None else None)
        repr_ = _query_pool(query, keys, x, flat_mask)    # [B*N, H]
        return x.reshape(B, N, S, H), repr_.reshape(B, N, H)


def fuse_cnn_params(embedding_params: dict, encoder_params: dict) -> dict:
    """(WordEmbedding params, CnnNewsEncoder params) → FusedCnnNewsEncoder
    params with identical math."""
    return {
        "embedding": embedding_params["embedding"],
        "kernel": encoder_params["Conv_0"]["kernel"],
        "bias": encoder_params["Conv_0"]["bias"],
        "query_words": encoder_params["query_words"],
        "word_query_project": encoder_params["word_query_project"],
    }


def unfuse_cnn_params(fused: dict) -> Tuple[dict, dict]:
    """Inverse of fuse_cnn_params: → (embedding params, encoder params)."""
    return (
        {"embedding": fused["embedding"]},
        {"Conv_0": {"kernel": fused["kernel"], "bias": fused["bias"]},
         "query_words": fused["query_words"],
         "word_query_project": fused["word_query_project"]},
    )


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
