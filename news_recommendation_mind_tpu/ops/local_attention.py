"""Block-banded local+global attention for the long-context PLM family.

The XFormer variants (Longformer w=32 / BigBird block 64 / Reformer
chunked) attend locally plus a global [CLS]. The naive realization
materialises S x S scores; this version exploits the band structure the
TPU way: reshape the sequence into BS-sized key blocks and gather, per
query block i, only the blocks that can contain allowed keys —
{i-1, i, i+1, 0} (window <= BS) — giving O(S·BS) score tensors that XLA
tiles cleanly onto the MXU, instead of O(S²). The global *query* row 0
(CLS attends everywhere) is computed exactly with one [1, S] row and
patched in. Numerics are exactly the full banded masked softmax
(verified against the dense reference in tests), and the whole thing is
differentiable JAX, so the VJP inherits the same block structure.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..models.attention import masked_softmax


def _block_neighbors(x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """x [..., nb, BS, D] → (prev, self, next, first) along the block axis."""
    prev = jnp.roll(x, 1, axis=-3)
    nxt = jnp.roll(x, -1, axis=-3)
    first = jnp.broadcast_to(x[..., 0:1, :, :], x.shape[:-3] + (
        x.shape[-3], x.shape[-2], x.shape[-1]))
    return prev, x, nxt, first


def block_local_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          key_mask: jnp.ndarray, window: int,
                          block_size: int = 128) -> jnp.ndarray:
    """Banded attention with global position 0 (rows and columns).

    q/k/v [B, H, S, D]; key_mask [B, S] (1 = valid). Allowed (i, j):
    |i-j| <= window or j == 0 or i == 0, and j valid. Requires
    window <= block_size; S is padded internally to a block multiple.
    """
    assert window <= block_size
    B, Hh, S, D = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, q.dtype))

    pad = (-S) % block_size
    if pad:
        zc = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, zc)
        k = jnp.pad(k, zc)
        v = jnp.pad(v, zc)
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))
    Sp = S + pad
    nb = Sp // block_size
    BS = block_size

    qb = q.reshape(B, Hh, nb, BS, D)
    kb = k.reshape(B, Hh, nb, BS, D)
    vb = v.reshape(B, Hh, nb, BS, D)

    keys = jnp.concatenate(_block_neighbors(kb), axis=-2)  # [B,H,nb,4BS,D]
    vals = jnp.concatenate(_block_neighbors(vb), axis=-2)

    mpad = key_mask.reshape(B, nb, BS)
    key_padding = jnp.concatenate([
        jnp.roll(mpad, 1, axis=1), mpad, jnp.roll(mpad, -1, axis=1),
        jnp.broadcast_to(mpad[:, 0:1], mpad.shape),
    ], axis=-1)                                   # [B, nb, 4BS]

    # ---- validity of each gathered key position -------------------------
    i_idx = jnp.arange(nb)[:, None, None]        # block index
    jq = jnp.arange(BS)[None, :, None]           # query offset in block
    jk = jnp.arange(BS)[None, None, :]           # key offset in block
    qpos = i_idx * BS + jq                       # [nb, BS, 1]

    def group_valid(kpos, exists):
        band = jnp.abs(qpos - kpos) <= window
        glob = kpos == 0
        return (band | glob) & exists            # [nb, BS, BS]

    valid = jnp.concatenate([
        group_valid((i_idx - 1) * BS + jk, i_idx >= 1),
        group_valid(i_idx * BS + jk, jnp.full_like(i_idx, True, bool)),
        group_valid((i_idx + 1) * BS + jk, i_idx <= nb - 2),
        # the dedicated block-0 copy only when blocks -1/0/+1 missed it
        group_valid(jk + 0 * qpos, i_idx >= 2),
    ], axis=-1).astype(q.dtype)                  # [nb, BS, 4BS]

    scores = jnp.einsum("bhnqd,bhnkd->bhnqk", qb, keys) * scale
    mask = valid[None, None] * key_padding[:, None, :, None, :]
    probs = masked_softmax(scores, mask)
    out = jnp.einsum("bhnqk,bhnkd->bhnqd", probs, vals)
    out = out.reshape(B, Hh, Sp, D)

    # ---- exact global query row 0 ---------------------------------------
    q0 = q[:, :, 0:1, :]                          # [B,H,1,D]
    s0 = jnp.einsum("bhqd,bhkd->bhqk", q0, k) * scale
    p0 = masked_softmax(s0, key_mask[:, None, None, :])
    out0 = jnp.einsum("bhqk,bhkd->bhqd", p0, v)
    out = out.at[:, :, 0:1, :].set(out0)

    return out[:, :, :S, :]
