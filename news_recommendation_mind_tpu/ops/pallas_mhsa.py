"""Pallas TPU kernel: fused multi-head self-attention for short articles.

The PLM news encoder runs full attention over S=30-token articles
(reference models/PLM.py:93-126 pushes [bs*news, 30] through BERT). On
the v5e profile this regime is pathological for the unfused XLA path:
the per-head [*, 30, 64] score/context matmuls run at 1-3% MXU (30×30
tiles), and the [U, heads, 30, 64] head-split transposes plus the
[U·heads, 30, 30] probability/dropout tensors round-trip HBM — together
~46 ms of the 132 ms newsbert train step (BASELINE.md round-3 PLM
decomposition).

This kernel removes all of it:

- Q/K/V stay in their natural [U·S, H] layout end to end; no head-split
  transposes exist anywhere. Mosaic only allows 128-aligned lane blocks,
  so each grid cell DMAs a G-head group (G·head_dim = 128 lanes, or the
  whole H when H ≤ 128) and separates heads *inside* the MXU: with the
  query lanes of every other head zeroed, Q_g·Kᵀ contracts to exactly
  head g's scores (the other heads' K lanes meet zeros). The MXU pads
  64-wide contractions to 128 anyway, so the masked full-width matmul
  costs the same as a per-head one.
- P articles are packed per grid cell and their scores computed as ONE
  MXU-aligned [P·S, P·S] matmul with a block-diagonal article mask
  (cross-article pairs are masked out of the softmax, so the math is
  exactly per-article attention).
- softmax (fp32, masked_softmax semantics: masked→exactly 0,
  fully-masked rows→all-zero) and attention-prob dropout fuse in VMEM;
  dropout bits come from the TPU hardware PRNG seeded per (cell, head),
  so the backward kernel regenerates the identical mask instead of
  storing [U·heads, 30, 30] bits in HBM.
- the backward pass recomputes scores flash-style (custom VJP); each
  grid cell owns a disjoint [P·S, G·hd] slice of dQ/dK/dV, so there is
  no cross-cell accumulation.

``short_mhsa`` is the dispatcher: the Pallas kernel on TPU backends, an
equivalent XLA formulation elsewhere (CPU tests run the kernel in
interpret mode).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _interp(flag: bool):
    """interpret=True runs the TPU *simulator* interpret mode — the plain
    HLO interpreter has no lowering for the TPU PRNG primitives the
    dropout path uses. The simulator's PRNG ignores in-kernel prng_seed
    values and its bit stream is a zero-stub, so dropout-bit behavior is
    validated on hardware (scripts/validate_mhsa_tpu.py)."""
    return pltpu.InterpretParams(random_seed=1234) if flag else False


def _block_masks(kvalid, R: int, S: int):
    """Block-diagonal article mask [R, R] (bool) from key validity [R]."""
    row_art = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // S
    col_art = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // S
    return (row_art == col_art) & (kvalid[None, :] > 0)


def _softmax_p(s, m):
    sig = jax.nn.softmax(jnp.where(m, s, NEG_INF), axis=-1)
    mf = m.astype(jnp.float32)
    return sig, sig * mf, mf


def _keep_bits(shape, p_drop: float, seed_ref, cell, head, n_heads):
    """Hardware-PRNG keep mask, seeded per (seed, cell*n_heads + head) so
    fwd and bwd regenerate identical bits (Mosaic allows at most two
    seed values, so the grid position folds into one)."""
    pltpu.prng_seed(seed_ref[0], cell * n_heads + head)
    bits = pltpu.prng_random_bits(shape).astype(jnp.uint32)
    thresh = jnp.uint32(int(round((1.0 - p_drop) * float(2 ** 32 - 1))))
    return bits <= thresh


# lane-stacking helpers shared with the banded kernel (round 5)
from .pallas_attention import (  # noqa: E402
    _stack_groups as _stack_lanes,
    _unstack_groups as _unstack_lanes_impl,
)


def _unstack_lanes(stk, G, hd, R):
    return _unstack_lanes_impl(stk, G, hd, R)


def _keep_bits_stacked(R, G, p_drop, seed_ref, cell, n_heads):
    """Per-group keep masks stacked [G·R, R] — the same per-(cell, head)
    seeding/bit stream as the unstacked kernels (oracle-compatible;
    scripts/validate_mhsa_tpu.py passes on this form)."""
    return jnp.concatenate(
        [_keep_bits((R, R), p_drop, seed_ref, cell,
                    pl.program_id(1) * G + g, n_heads)
         for g in range(G)], axis=0)


def _fwd_kernel(seed_ref, mask_ref, q_ref, k_ref, v_ref, o_ref, *,
                S: int, hd: int, G: int, n_heads: int, scale: float,
                p_drop: float):
    R, W = q_ref.shape
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    m = _block_masks(mask_ref[0, 0, :], R, S)
    ms = jnp.concatenate([m] * G, axis=0)
    qs = _stack_lanes(q, G, hd)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    sig, p, _ = _softmax_p(s, ms)
    if p_drop > 0.0:
        keep = _keep_bits_stacked(R, G, p_drop, seed_ref,
                                  pl.program_id(0), n_heads)
        p = jnp.where(keep, p / (1.0 - p_drop), 0.0)
    o_stk = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[:] = _unstack_lanes(o_stk, G, hd, R).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, mask_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *,
                S: int, hd: int, G: int, n_heads: int, scale: float,
                p_drop: float):
    R, W = q_ref.shape
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    m = _block_masks(mask_ref[0, 0, :], R, S)
    ms = jnp.concatenate([m] * G, axis=0)
    qs = _stack_lanes(q, G, hd)
    dos = _stack_lanes(do, G, hd)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    sig, p, mf = _softmax_p(s, ms)
    if p_drop > 0.0:
        keep = _keep_bits_stacked(R, G, p_drop, seed_ref,
                                  pl.program_id(0), n_heads)
        pd = jnp.where(keep, p / (1.0 - p_drop), 0.0)
    else:
        keep, pd = None, p
    # contracting over the G·R stacked rows sums the per-group outer
    # products in one matmul each
    dv = jax.lax.dot_general(pd, dos, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpd = jax.lax.dot_general(dos, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if keep is not None:
        dp = jnp.where(keep, dpd / (1.0 - p_drop), 0.0)
    else:
        dp = dpd
    # p = sig·m  ⇒  dσ = dp·m;  ds = σ⊙(dσ − Σ σ⊙dσ)
    dsig = dp * mf
    ds = sig * (dsig - jnp.sum(sig * dsig, axis=-1, keepdims=True))
    dq_stk = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, qs, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[:] = _unstack_lanes(dq_stk, G, hd, R).astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _specs(P: int, S: int, W: int, n_tensors: int):
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    # mask rides [U//P, 1, P·S] so the block's trailing dims equal the
    # array dims (TPU block-shape tiling rule)
    mask_spec = pl.BlockSpec((1, 1, P * S), lambda i, h: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((P * S, W), lambda i, h: (i, h),
                          memory_space=pltpu.VMEM)
    return seed_spec, mask_spec, [t_spec] * n_tensors, t_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _mhsa(q, k, v, key_mask, seed, hd, G, S, p_drop, P, interpret):
    return _mhsa_fwd_impl(q, k, v, key_mask, seed, hd, G, S, p_drop, P,
                          interpret)


def _mhsa_fwd_impl(q, k, v, key_mask, seed, hd, G, S, p_drop, P,
                   interpret):
    US, H = q.shape
    U = US // S
    W = hd * G
    scale = 1.0 / float(hd) ** 0.5
    seed_spec, mask_spec, in_specs, out_spec = _specs(P, S, W, 3)
    kern = functools.partial(_fwd_kernel, S=S, hd=hd, G=G,
                             n_heads=H // hd, scale=scale, p_drop=p_drop)
    return pl.pallas_call(
        kern,
        grid=(U // P, H // W),
        in_specs=[seed_spec, mask_spec] + in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((US, H), q.dtype),
        interpret=_interp(interpret),
    )(seed, key_mask.reshape(U // P, 1, P * S), q, k, v)


def _mhsa_fwd(q, k, v, key_mask, seed, hd, G, S, p_drop, P, interpret):
    out = _mhsa_fwd_impl(q, k, v, key_mask, seed, hd, G, S, p_drop, P,
                         interpret)
    return out, (q, k, v, key_mask, seed)


def _mhsa_bwd(hd, G, S, p_drop, P, interpret, residuals, g):
    q, k, v, key_mask, seed = residuals
    US, H = q.shape
    U = US // S
    W = hd * G
    scale = 1.0 / float(hd) ** 0.5
    seed_spec, mask_spec, in_specs, out_spec = _specs(P, S, W, 4)
    kern = functools.partial(_bwd_kernel, S=S, hd=hd, G=G,
                             n_heads=H // hd, scale=scale, p_drop=p_drop)
    shp = jax.ShapeDtypeStruct((US, H), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(U // P, H // W),
        in_specs=[seed_spec, mask_spec] + in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(shp, shp, shp),
        interpret=_interp(interpret),
    )(seed, key_mask.reshape(U // P, 1, P * S), q, k, v, g)
    return dq, dk, dv, jnp.zeros_like(key_mask), jnp.zeros_like(seed)


_mhsa.defvjp(_mhsa_fwd, _mhsa_bwd)


def dropout_keep_bits(seed, n_cells: int, n_heads: int, R: int,
                      p_drop: float, interpret: bool = False):
    """Test oracle: the exact keep mask each (cell, head) draw uses, via
    the same seeding as the fwd/bwd kernels → bool [cells, heads, R, R].
    (grid runs over global head ids — the head-group kernels seed with
    head = group·G + g, which enumerates the same ids.)"""

    def kern(seed_ref, o_ref):
        keep = _keep_bits((R, R), p_drop, seed_ref, pl.program_id(0),
                          pl.program_id(1), n_heads)
        o_ref[0, 0] = keep.astype(jnp.int32)

    out = pl.pallas_call(
        kern,
        grid=(n_cells, n_heads),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, R, R), lambda i, h: (i, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cells, n_heads, R, R),
                                       jnp.int32),
        interpret=_interp(interpret),
    )(seed)
    return out > 0


def _xla_reference(q3, k3, v3, key_mask, n_heads, p_drop, dropout_rng):
    """Equivalent XLA formulation (non-TPU backends): identical math,
    dropout from the JAX RNG (a different — equally valid — stream)."""
    from ..models.attention import masked_softmax
    U, S, H = q3.shape
    hd = H // n_heads

    def heads(t):
        return t.reshape(U, S, n_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q3), heads(k3), heads(v3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(hd, q.dtype))
    probs = masked_softmax(scores, key_mask[:, None, None, :])
    if p_drop > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - p_drop, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - p_drop), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(U, S, H)


def mhsa_plan(S: int, H: int, n_heads: int, articles_per_block: int):
    """(P, G) for the kernel, or None when the shape doesn't map.

    P·S must be a sublane multiple (8); the per-cell lane width G·hd must
    be 128-aligned or the whole H (Mosaic block rules); G must divide
    n_heads."""
    if H % n_heads:
        return None
    hd = H // n_heads
    if H <= 128:
        G = n_heads
    elif 128 % hd == 0:
        G = 128 // hd
        if n_heads % G:
            return None
    else:
        return None
    m0 = 8 // math.gcd(S, 8)
    P = max(1, -(-articles_per_block // m0)) * m0
    return P, G


def short_mhsa(q3: jnp.ndarray, k3: jnp.ndarray, v3: jnp.ndarray,
               key_mask: jnp.ndarray, n_heads: int,
               p_drop: float = 0.0,
               dropout_rng=None,
               articles_per_block: int = 8,
               interpret: bool = False,
               force_kernel: bool = False,
               seq_len: int = 0) -> jnp.ndarray:
    """Fused short-sequence MHSA: [U, S, H] q/k/v (+ key mask [U, S]) →
    [U, S, H] context, heads split internally. Inputs may also arrive
    pre-flattened as [U·S, H] with ``seq_len=S`` — the kernel's native
    layout, avoiding any 3-D↔2-D relayout at the boundary (the 2-D
    residual-stream fast path in models/bert.py).

    ``p_drop`` > 0 applies attention-probability dropout (requires
    ``dropout_rng``). On TPU backends the fused Pallas kernel runs; the
    XLA formulation is used elsewhere or when the shape doesn't map
    (tests force the kernel in interpret mode on CPU).
    """
    flat = q3.ndim == 2
    if flat:
        assert seq_len > 0
        S = seq_len
        US, H = q3.shape
        U = US // S
    else:
        U, S, H = q3.shape
    plan = mhsa_plan(S, H, n_heads, articles_per_block)
    use_kernel = force_kernel or jax.default_backend() in ("tpu", "axon")
    if not use_kernel or plan is None:
        if flat:
            out = _xla_reference(q3.reshape(U, S, H), k3.reshape(U, S, H),
                                 v3.reshape(U, S, H), key_mask, n_heads,
                                 p_drop, dropout_rng)
            return out.reshape(U * S, H)
        return _xla_reference(q3, k3, v3, key_mask, n_heads, p_drop,
                              dropout_rng)
    P, G = plan
    hd = H // n_heads
    pad = (-U) % P
    if pad:
        zc = ((0, pad * S), (0, 0)) if flat else \
            ((0, pad), (0, 0), (0, 0))
        q3, k3, v3 = (jnp.pad(t, zc) for t in (q3, k3, v3))
        key_mask = jnp.pad(key_mask, ((0, pad), (0, 0)))
        U += pad
    if p_drop > 0.0:
        assert dropout_rng is not None
        seed = jax.lax.bitcast_convert_type(
            jax.random.bits(dropout_rng, (1,), jnp.uint32), jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _mhsa(q3.reshape(U * S, H), k3.reshape(U * S, H),
                v3.reshape(U * S, H), key_mask.astype(jnp.float32),
                seed, hd, G, S, float(p_drop), P, interpret)
    if flat:
        return out[:(U - pad) * S] if pad else out
    out = out.reshape(U, S, H)
    return out[:U - pad] if pad else out
