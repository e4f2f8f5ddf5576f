"""Pallas TPU kernel: fused per-leaf Adam update (param += step in-place).

Round-3 substrate measurements (BASELINE.md) on the v5e: XLA's per-leaf
Adam fusions over T(8,128)-tiled 2-D tensors run at ~85 GB/s, while the
identical 7-stream elementwise update over a flat T(1024) buffer streams
at ~770 GB/s — but concatenating grads into a flat buffer pays ~19 ms of
tile-layout conversions, a wash. This kernel gets the fast path without
the retile: it walks each leaf in its NATIVE tiling with explicit
row-block DMA (sequential HBM traffic), performs the Adam math in VMEM,
and writes param/mu/nu in place (input_output_aliases), also folding the
optax.apply_updates add into the same pass.

The math is bitwise-identical to optax.adam's (same op order; see
train/state.py make_fused_optimizer, whose non-TPU path is the pinned
jnp formulation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp(flag: bool):
    return pltpu.InterpretParams() if flag else False


def _adam_kernel(sc_ref, p_ref, mu_ref, nu_ref, g_ref,
                 po_ref, muo_ref, nuo_ref, *,
                 b1: float, b2: float, eps: float):
    g = g_ref[:]
    mu = b1 * mu_ref[:] + (1.0 - b1) * g
    nu = b2 * nu_ref[:] + (1.0 - b2) * (g * g)
    mu_hat = mu / sc_ref[0]
    nu_hat = nu / sc_ref[1]
    upd = (mu_hat / (jnp.sqrt(nu_hat) + eps)) * (-sc_ref[2])
    po_ref[:] = p_ref[:] + upd
    muo_ref[:] = mu
    nuo_ref[:] = nu


def adam_leaf_eligible(leaf) -> bool:
    """Leaves the kernel takes: f32, last dim a lane multiple, >=1k
    elements (smaller ones are launch-overhead-bound; XLA keeps them),
    and rows tileable (8-divisible, or whole-leaf single block ≤2 MB —
    notably the [30522, 768] embedding fails the row rule AND is the one
    leaf XLA already streams at full rate, so it stays on XLA)."""
    if not (leaf.dtype == jnp.float32 and leaf.ndim >= 1
            and leaf.shape[-1] % 128 == 0 and leaf.size >= 1024):
        return False
    C = leaf.shape[-1]
    R = max(leaf.size // C, 1)
    return R % 8 == 0 or R * C * 4 <= (2 << 20)


def _pick_block_rows(R: int, block_rows: int = 64) -> int:
    """Row-block size for a [R, C] leaf: Mosaic requires the sublane
    dim divisible by 8 OR equal to the full array dim, so a leaf whose
    rows are not 8-divisible (eligible only via the ≤2 MB whole-leaf
    rule) must take R itself as the single block — halving down from 64
    could land on a non-8-divisible divisor (e.g. R=310 → BR=2, a
    lowering error seen on a real [310, 768] user-embedding leaf).

    ~0.75 MB per widest buffer: 7 live block buffers double-buffered
    must stay inside the ~16 MB scoped-VMEM budget."""
    if R % 8:
        return R
    BR = min(block_rows, R)
    while R % BR or BR % 8:
        BR //= 2
    return max(BR, 8)


def adam_leaf_update(p, mu, nu, g, scalars, *, b1: float, b2: float,
                     eps: float, block_rows: int = 64,
                     interpret: bool = False):
    """(p, mu, nu, g, [bc1, bc2, lr]) → (p', mu', nu') — fused in-place
    Adam on one leaf, viewed as [R, C] rows of its last dimension."""
    shape = p.shape
    C = shape[-1]
    R = max(p.size // C, 1)
    view = (R, C)
    BR = _pick_block_rows(R, block_rows)
    grid = (R // BR,)
    spec = pl.BlockSpec((BR, C), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kern = functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps)
    shp = jax.ShapeDtypeStruct(view, jnp.float32)
    po, muo, nuo = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[sc_spec, spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shp, shp, shp),
        # p/mu/nu update in place (inputs 1..3 → outputs 0..2; index 0
        # is the scalar vector)
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=_interp(interpret),
    )(scalars, p.reshape(view), mu.reshape(view), nu.reshape(view),
      g.reshape(view))
    return po.reshape(shape), muo.reshape(shape), nuo.reshape(shape)
