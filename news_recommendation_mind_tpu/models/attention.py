"""Attention primitives.

Counterparts of the reference's Modules/Attention.py, re-expressed for XLA:

- ``scaled_dp_attention`` (reference models/Modules/Attention.py:5-30) —
  the query-pooling workhorse used by every encoder.
- masked softmax: the reference hand-writes ``XSoftmax``, a custom autograd
  Function calling the private CUDA ``_softmax_backward_data`` for a
  memory-lean backward (reference models/Modules/Attention.py:56-80). On
  TPU that entire trick is just ``where`` + ``softmax`` — XLA fuses the
  mask into the softmax and its VJP with no materialised intermediate, so
  the "kernel" is free.
- ``MultiheadAttention`` (reference models/Modules/Attention.py:83-147) —
  including its deliberate parameter-tying quirk: queries and keys share
  one projection (reference models/Modules/Attention.py:125-126).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e9


def masked_softmax(scores: jnp.ndarray,
                   mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Softmax over the last axis with 0/1 mask; masked positions get
    exactly-zero probability (XSoftmax semantics). Fully-masked rows yield
    all-zero rows instead of NaN."""
    if mask is None:
        return nn.softmax(scores, axis=-1)
    mask = mask.astype(scores.dtype)
    probs = nn.softmax(jnp.where(mask > 0, scores, NEG_INF), axis=-1)
    return probs * mask


def scaled_dp_attention(query: jnp.ndarray, key: jnp.ndarray,
                        value: jnp.ndarray,
                        attn_mask: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """softmax(q·kᵀ/√d)·v with broadcastable leading dims.

    query [..., Q, D], key [..., K, D], value [..., K, V],
    attn_mask broadcastable to [..., Q, K].
    """
    d = query.shape[-1]
    scores = jnp.einsum("...qd,...kd->...qk", query, key) / jnp.sqrt(
        jnp.asarray(d, query.dtype))
    probs = masked_softmax(scores, attn_mask)
    return jnp.einsum("...qk,...kv->...qv", probs, value)


def make_attn_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """[..., L] keep-mask → outer-product [..., L, L] self-attention mask
    (reference models/Modules/Attention.py:33-53's get_attn_mask)."""
    return mask[..., :, None] * mask[..., None, :]


class MultiheadAttention(nn.Module):
    """MHA with shared query/key projection (NRMS-style).

    The reference projects Q and K through the *same* Linear
    (reference models/Modules/Attention.py:125-126) — a deliberate
    parameter tying we reproduce. Output dim = head_num * value_dim.
    """
    head_num: int
    key_dim: int
    value_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray,
                 attn_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # hidden: [..., L, D]; attn_mask broadcastable to [..., L, L]
        kq_proj = nn.Dense(self.key_dim * self.head_num, dtype=self.dtype,
                           kernel_init=nn.initializers.xavier_normal(),
                           name="kq_proj")
        v_proj = nn.Dense(self.value_dim * self.head_num, dtype=self.dtype,
                          kernel_init=nn.initializers.xavier_normal(),
                          name="v_proj")

        def split_heads(x, dim):
            return x.reshape(*x.shape[:-1], self.head_num, dim)

        q = split_heads(kq_proj(hidden), self.key_dim)
        k = split_heads(kq_proj(hidden), self.key_dim)
        v = split_heads(v_proj(hidden), self.value_dim)
        # [..., h, L, d]
        q, k, v = (jnp.swapaxes(x, -2, -3) for x in (q, k, v))
        scores = jnp.einsum("...qd,...kd->...qk", q, k) / jnp.sqrt(
            jnp.asarray(self.key_dim, self.dtype))
        if attn_mask is not None:
            attn_mask = attn_mask[..., None, :, :]  # broadcast over heads
        probs = masked_softmax(scores, attn_mask)
        out = jnp.einsum("...qk,...kv->...qv", probs, v)
        out = jnp.swapaxes(out, -2, -3)  # [..., L, h, v]
        return out.reshape(*out.shape[:-2], self.head_num * self.value_dim)
