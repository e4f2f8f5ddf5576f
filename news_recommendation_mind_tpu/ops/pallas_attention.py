"""Pallas TPU kernel: block-banded local+global attention, fused.

The long-context PLM family (longformer w=32 / bigbird block 64 /
reformer chunked — reference models/PLM.py:66-78, models/XFormer.py:18-42)
attends within a band plus a global position 0. ops/local_attention.py
realises the band in pure XLA by materialising rolled key/value copies in
HBM (4x K/V traffic + [*, 4BS] score tensors). This kernel instead keeps
one (batch·head) slice resident in VMEM — S ≤ 1280 at the reference
length budgets (utils/Manager.py:1013-1026), so q/k/v/o fit comfortably
in the ~16 MB budget — and walks query blocks with an unrolled loop;
each query block contracts against only its {0, i-1, i, i+1} key blocks
on the MXU with the softmax fused in fp32 (no HBM score tensors, no
rolled copies).

Semantics are exactly ops/local_attention.block_local_attention
(including masked_softmax's zero-probability-for-masked and all-zero
fully-masked rows), verified by tests/test_pallas_attention.py; the
backward pass is a hand-written flash-style recompute kernel (custom
VJP) that accumulates dK/dV in VMEM scratch.

``local_global_attention`` is the dispatcher: the Pallas kernel on TPU
backends, the XLA fallback elsewhere (CPU tests, interpret mode).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .local_attention import block_local_attention

NEG_INF = -1e30


def _blocks_for(qi: int, nb: int) -> Sequence[int]:
    """Static key-block set for query block qi: {0, qi-1, qi, qi+1} ∩ nb."""
    return sorted({b for b in (0, qi - 1, qi, qi + 1) if 0 <= b < nb})


def _band_mask(qi: int, kj: int, BS: int, window: int) -> jnp.ndarray:
    qpos = qi * BS + jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 0)
    kpos = kj * BS + jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 1)
    return (jnp.abs(qpos - kpos) <= window) | (kpos == 0)


def _fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *,
                nb: int, BS: int, window: int, scale: float):
    for qi in range(nb):
        q_blk = q_ref[qi * BS:(qi + 1) * BS, :].astype(jnp.float32)
        blocks = _blocks_for(qi, nb)
        parts, masks = [], []
        for kj in blocks:
            k_blk = k_ref[kj * BS:(kj + 1) * BS, :].astype(jnp.float32)
            s = jax.lax.dot_general(
                q_blk, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            kvalid = mask_ref[0, 0, kj * BS:(kj + 1) * BS] > 0
            parts.append(s)
            masks.append(_band_mask(qi, kj, BS, window) & kvalid[None, :])
        s = jnp.concatenate(parts, axis=1)
        m = jnp.concatenate(masks, axis=1)
        p = jax.nn.softmax(jnp.where(m, s, NEG_INF), axis=-1)
        p = p * m.astype(jnp.float32)          # masked_softmax semantics
        o = jnp.zeros((BS, q_ref.shape[-1]), jnp.float32)
        for col, kj in enumerate(blocks):
            v_blk = v_ref[kj * BS:(kj + 1) * BS, :].astype(jnp.float32)
            o = o + jnp.dot(p[:, col * BS:(col + 1) * BS], v_blk,
                            preferred_element_type=jnp.float32)
        o_ref[qi * BS:(qi + 1) * BS, :] = o.astype(o_ref.dtype)


def _bwd_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                nb: int, BS: int, window: int, scale: float):
    dk_acc[:] = jnp.zeros_like(dk_acc)
    dv_acc[:] = jnp.zeros_like(dv_acc)
    for qi in range(nb):
        q_blk = q_ref[qi * BS:(qi + 1) * BS, :].astype(jnp.float32)
        do_blk = do_ref[qi * BS:(qi + 1) * BS, :].astype(jnp.float32)
        blocks = _blocks_for(qi, nb)
        parts, masks = [], []
        for kj in blocks:
            k_blk = k_ref[kj * BS:(kj + 1) * BS, :].astype(jnp.float32)
            s = jax.lax.dot_general(
                q_blk, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            kvalid = mask_ref[0, 0, kj * BS:(kj + 1) * BS] > 0
            parts.append(s)
            masks.append(_band_mask(qi, kj, BS, window) & kvalid[None, :])
        s = jnp.concatenate(parts, axis=1)
        m = jnp.concatenate(masks, axis=1)
        mf = m.astype(jnp.float32)
        sig = jax.nn.softmax(jnp.where(m, s, NEG_INF), axis=-1)
        p = sig * mf
        # dP from dO against each V block
        dp_parts = []
        for kj in blocks:
            v_blk = v_ref[kj * BS:(kj + 1) * BS, :].astype(jnp.float32)
            dp_parts.append(jax.lax.dot_general(
                do_blk, v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        dp = jnp.concatenate(dp_parts, axis=1)
        # p = softmax(s̃)·m  ⇒  dσ = dP·m; ds = σ⊙(dσ − Σ σ⊙dσ)
        dsig = dp * mf
        ds = sig * (dsig - jnp.sum(sig * dsig, axis=-1, keepdims=True))
        dq = jnp.zeros_like(q_blk)
        for col, kj in enumerate(blocks):
            ds_j = ds[:, col * BS:(col + 1) * BS]
            p_j = p[:, col * BS:(col + 1) * BS]
            k_blk = k_ref[kj * BS:(kj + 1) * BS, :].astype(jnp.float32)
            dq = dq + jnp.dot(ds_j, k_blk,
                              preferred_element_type=jnp.float32) * scale
            sl = slice(kj * BS, (kj + 1) * BS)
            dk_acc[sl, :] += jax.lax.dot_general(
                ds_j, q_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dv_acc[sl, :] += jax.lax.dot_general(
                p_j, do_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dq_ref[qi * BS:(qi + 1) * BS, :] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk_acc[:].astype(dk_ref.dtype)
    dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


def _specs(B: int, H: int, Sp: int, D: int, n_tensors: int):
    """mask spec + n_tensors tensor specs, grid over BH.

    Tensors ride 2-D as [BH*Sp, D] with (Sp, D) blocks (Mosaic lowers 2-D
    slices of narrow-D bf16 cleanly where leading-1 3-D views fail); the
    mask rides as [B, 1, Sp] so the block's trailing dims equal the array
    dims (TPU block-shape tiling rule)."""
    mask_spec = pl.BlockSpec((1, 1, Sp), lambda bh: (bh // H, 0, 0),
                             memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((Sp, D), lambda bh: (bh, 0),
                          memory_space=pltpu.VMEM)
    return mask_spec, [t_spec] * n_tensors, t_spec


def _reshape_in(x: jnp.ndarray) -> jnp.ndarray:
    B, H, S, D = x.shape
    return x.reshape(B * H * S, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _banded(q, k, v, key_mask, window, block_size, interpret):
    return _banded_fwd_impl(q, k, v, key_mask, window, block_size, interpret)


def _banded_fwd_impl(q, k, v, key_mask, window, block_size, interpret):
    B, H, S, D = q.shape
    Sp, nb = S, S // block_size
    scale = 1.0 / float(D) ** 0.5
    mask_spec, in_specs, out_spec = _specs(B, H, Sp, D, 3)
    kern = functools.partial(
        _fwd_kernel, nb=nb, BS=block_size, window=window, scale=scale)
    out = pl.pallas_call(
        kern,
        grid=(B * H,),
        in_specs=[mask_spec] + in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B * H * Sp, D), q.dtype),
        interpret=interpret,
    )(key_mask[:, None, :], _reshape_in(q), _reshape_in(k),
      _reshape_in(v))
    return out.reshape(B, H, Sp, D)


def _banded_fwd(q, k, v, key_mask, window, block_size, interpret):
    out = _banded_fwd_impl(q, k, v, key_mask, window, block_size, interpret)
    return out, (q, k, v, key_mask)


def _banded_bwd(window, block_size, interpret, residuals, g):
    q, k, v, key_mask = residuals
    B, H, S, D = q.shape
    nb = S // block_size
    scale = 1.0 / float(D) ** 0.5
    mask_spec, in_specs, out_spec = _specs(B, H, S, D, 4)
    kern = functools.partial(
        _bwd_kernel, nb=nb, BS=block_size, window=window, scale=scale)
    shp = jax.ShapeDtypeStruct((B * H * S, D), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B * H,),
        in_specs=[mask_spec] + in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(shp, shp, shp),
        scratch_shapes=[pltpu.VMEM((S, D), jnp.float32),
                        pltpu.VMEM((S, D), jnp.float32)],
        interpret=interpret,
    )(key_mask[:, None, :], _reshape_in(q), _reshape_in(k),
      _reshape_in(v), _reshape_in(g))
    rs = lambda x: x.reshape(B, H, S, D)
    return rs(dq), rs(dk), rs(dv), jnp.zeros_like(key_mask)


_banded.defvjp(_banded_fwd, _banded_bwd)


def pallas_block_local_attention(q: jnp.ndarray, k: jnp.ndarray,
                                 v: jnp.ndarray, key_mask: jnp.ndarray,
                                 window: int,
                                 block_size: int = 128,
                                 interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas realisation of block_local_attention (same
    signature/semantics: banded + global key/query position 0)."""
    assert window <= block_size
    B, H, S, D = q.shape
    pad = (-S) % block_size
    if pad:
        zc = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = jnp.pad(q, zc), jnp.pad(k, zc), jnp.pad(v, zc)
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))
    out = _banded(q, k, v, key_mask.astype(jnp.float32), window,
                  block_size, interpret)
    # exact global query row 0 (CLS attends everywhere), as in the XLA
    # version — differentiable JAX outside the kernel
    from ..models.attention import masked_softmax
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, q.dtype))
    q0 = q[:, :, 0:1, :]
    s0 = jnp.einsum("bhqd,bhkd->bhqk", q0, k) * scale
    p0 = masked_softmax(s0, key_mask[:, None, None, :])
    out0 = jnp.einsum("bhqk,bhkd->bhqd", p0, v)
    out = jnp.concatenate([out0, out[:, :, 1:, :]], axis=2)
    return out[:, :, :S, :]


def local_global_attention(q, k, v, key_mask, window, block_size=128):
    """Backend dispatcher: the fused Pallas kernel on TPU, the XLA
    block-banded fallback elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return pallas_block_local_attention(q, k, v, key_mask, window,
                                            block_size)
    return block_local_attention(q, k, v, key_mask, window, block_size)


# ---------------------------------------------------------------------------
# Full-width lane-masked banded MHSA (round-4 ledger follow-up; round-5
# flash-merged global column)
#
# The per-(batch·head) kernel above runs B·H thin [S, 64] grid cells —
# at the XFormer bench shapes that is 384 sequential cells whose D=64
# matmuls half-fill the MXU, measured ~7× off the stream floor, plus
# ~24 ms/step of head split/merge copies around it (BASELINE.md round-4
# XFormer ledger). The kernel below applies ops/pallas_mhsa.py's proven
# recipe to the band: q/k/v stay in their natural [B·S, H] layout (no
# head-split transposes anywhere), each grid cell owns a [S, 128-lane]
# head-GROUP slice, and heads separate *inside* the MXU by zeroing the
# other head's query lanes (the masked full-width contraction costs the
# same as a per-head one — the MXU pads 64-wide contractions to 128
# anyway). Grid: (B, H/128) fat cells instead of (B·H,) thin ones.
#
# Round-5 (the round-4 ledger's named next cut): the remaining kernel
# cost was VPU-bound masked softmax over {0, i-1, i, i+1} block columns
# — 512 score lanes per query row of which ~3/4 were band-masked, with
# block 0 contributing 128 columns for ONE global key. Now each query
# block reads a single contiguous key window of KW = BS + 2·pad lanes
# (pad = window rounded up to sublane alignment; 192 lanes at the
# longformer w=32 budget), the band mask EXCLUDES key 0, and the global
# key's score is computed as one extra column outside the window and
# merged into the softmax flash-style (shared running max, one joint
# normalizer) — mathematically exact, 512 → 192 softmax lanes and score
# /PV matmul columns per query row.
#
# Semantics are exactly block_local_attention (banded window + global
# key/query position 0, masked_softmax zero conventions); the backward
# is the same flash-style recompute with VMEM dk/dv accumulators.
# ---------------------------------------------------------------------------


def _key_window(qi: int, BS: int, KW: int, window: int, S: int) -> int:
    """Static start row of query block qi's contiguous key window.

    Covers the full band [qi·BS − window, (qi+1)·BS − 1 + window]
    (asserted at trace time); key 0 is handled by the global merge."""
    pad = (KW - BS) // 2
    start = min(max(qi * BS - pad, 0), S - KW)
    assert start <= max(qi * BS - window, 0)
    assert start + KW >= min((qi + 1) * BS + window, S)
    return start


def _stack_groups(blk: jnp.ndarray, G: int, hd: int) -> jnp.ndarray:
    """[R, W] → [G·R, W]: copy g keeps only head-group g's lanes.

    Stacking lets ONE matmul carry all G lane-masked head groups (the
    per-g matmuls were too small to hide per-op overhead — the stacked
    [G·R, ·] ops double the MXU fill at G=2 and fuse the per-g dk/dv
    accumulation matmuls in the backward into single contractions).
    Operands stay f32 in-kernel: a bf16-operand variant was measured
    SLOWER end to end (fwd+bwd 2.49 → 2.83 ms at bench shapes — the
    casts cost more than the f32 matmul penalty at these tile sizes)."""
    R, W = blk.shape
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (G * R, W), 1) // hd
    row_g = jax.lax.broadcasted_iota(jnp.int32, (G * R, W), 0) // R
    keep = (lane_g == row_g).astype(blk.dtype)
    return jnp.concatenate([blk] * G, axis=0) * keep


def _unstack_groups(stk: jnp.ndarray, G: int, hd: int, R: int
                    ) -> jnp.ndarray:
    """[G·R, W] → [R, W]: lane-masked sum of the G copies (the lane
    groups partition W, so this just selects each group's lanes)."""
    W = stk.shape[1]
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1) // hd
    o = jnp.zeros((R, W), jnp.float32)
    for g in range(G):
        lm = (lane_head == g).astype(jnp.float32)
        o = o + stk[g * R:(g + 1) * R, :] * lm
    return o


def _merged_softmax(st, sg_eff, mf, gvf):
    """Joint masked softmax over band columns + the single global
    column (flash-style shared max / one normalizer). Fully-masked
    rows → all-zero probabilities (masked_softmax convention)."""
    smax = jnp.maximum(jnp.max(st, axis=-1, keepdims=True), sg_eff)
    e = jnp.exp(st - smax) * mf
    e_g = jnp.exp(sg_eff - smax) * gvf
    z = jnp.sum(e, axis=-1, keepdims=True) + e_g
    zinv = jnp.where(z > 0, 1.0 / z, 0.0)
    return e * zinv, e_g * zinv


def _band_inputs(mask_ref, qi, BS, KW, window, S, G):
    """Static band geometry for query block qi: key-window start plus
    the stacked validity mask (band excludes the global key 0)."""
    start = _key_window(qi, BS, KW, window, S)
    qpos = qi * BS + jax.lax.broadcasted_iota(jnp.int32, (BS, KW), 0)
    kpos = start + jax.lax.broadcasted_iota(jnp.int32, (BS, KW), 1)
    kvalid = mask_ref[0, 0, start:start + KW] > 0
    m = (jnp.abs(qpos - kpos) <= window) & (kpos != 0) & kvalid[None, :]
    mf = jnp.concatenate([m.astype(jnp.float32)] * G, axis=0)
    return start, mf


def _bmhsa_fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *,
                      nb: int, BS: int, KW: int, window: int, hd: int,
                      G: int, scale: float):
    S, W = q_ref.shape
    k0 = k_ref[0:1, :].astype(jnp.float32)            # global key row
    v0 = v_ref[0:1, :].astype(jnp.float32)
    g_valid = mask_ref[0, 0, 0] > 0
    gvf = jnp.float32(1.0) * g_valid
    for qi in range(nb):
        start, mf = _band_inputs(mask_ref, qi, BS, KW, window, S, G)
        qs = _stack_groups(q_ref[qi * BS:(qi + 1) * BS, :]
                           .astype(jnp.float32), G, hd)
        k_win = k_ref[start:start + KW, :].astype(jnp.float32)
        v_win = v_ref[start:start + KW, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            qs, k_win, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [G·BS, KW]
        sg = jax.lax.dot_general(
            qs, k0, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [G·BS, 1]
        st = jnp.where(mf > 0, s, NEG_INF)
        sg_eff = jnp.where(g_valid, sg, NEG_INF)
        p, p_g = _merged_softmax(st, sg_eff, mf, gvf)
        o_stk = jnp.dot(p, v_win,
                        preferred_element_type=jnp.float32) + p_g * v0
        o_ref[qi * BS:(qi + 1) * BS, :] = _unstack_groups(
            o_stk, G, hd, BS).astype(o_ref.dtype)
    # exact global query row 0 (CLS attends every valid key) — k/v are
    # already VMEM-resident, so the full [G, S] row costs two skinny
    # matmuls instead of the former outside-kernel einsums + a
    # full-output concat in HBM
    q0s = _stack_groups(q_ref[0:1, :].astype(jnp.float32), G, hd)
    k_all = k_ref[:, :].astype(jnp.float32)
    v_all = v_ref[:, :].astype(jnp.float32)
    s0 = jax.lax.dot_general(
        q0s, k_all, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [G, S]
    kvalid_all = (mask_ref[0, 0, :] > 0)[None, :]
    m0 = jnp.concatenate([kvalid_all.astype(jnp.float32)] * G, axis=0)
    st0 = jnp.where(m0 > 0, s0, NEG_INF)
    m0max = jnp.max(st0, axis=-1, keepdims=True)
    e0 = jnp.exp(st0 - m0max) * m0
    z0 = jnp.sum(e0, axis=-1, keepdims=True)
    p0 = e0 * jnp.where(z0 > 0, 1.0 / z0, 0.0)
    o0 = jnp.dot(p0, v_all, preferred_element_type=jnp.float32)
    o_ref[0:1, :] = _unstack_groups(o0, G, hd, 1).astype(o_ref.dtype)


def _bmhsa_bwd_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                      nb: int, BS: int, KW: int, window: int, hd: int,
                      G: int, scale: float):
    S, W = q_ref.shape
    dk_acc[:] = jnp.zeros_like(dk_acc)
    dv_acc[:] = jnp.zeros_like(dv_acc)
    k0 = k_ref[0:1, :].astype(jnp.float32)
    v0 = v_ref[0:1, :].astype(jnp.float32)
    g_valid = mask_ref[0, 0, 0] > 0
    gvf = jnp.float32(1.0) * g_valid
    dk0 = jnp.zeros((1, W), jnp.float32)
    dv0 = jnp.zeros((1, W), jnp.float32)
    for qi in range(nb):
        start, mf = _band_inputs(mask_ref, qi, BS, KW, window, S, G)
        do_blk = do_ref[qi * BS:(qi + 1) * BS, :].astype(jnp.float32)
        if qi == 0:
            # row 0's banded output is overwritten by the global row in
            # the forward, so its cotangent must not feed the band path
            row = jax.lax.broadcasted_iota(jnp.int32, (BS, W), 0)
            do_blk = jnp.where(row == 0, 0.0, do_blk)
        qs = _stack_groups(q_ref[qi * BS:(qi + 1) * BS, :]
                           .astype(jnp.float32), G, hd)
        dos = _stack_groups(do_blk, G, hd)
        k_win = k_ref[start:start + KW, :].astype(jnp.float32)
        v_win = v_ref[start:start + KW, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            qs, k_win, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        sg = jax.lax.dot_general(
            qs, k0, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        st = jnp.where(mf > 0, s, NEG_INF)
        sg_eff = jnp.where(g_valid, sg, NEG_INF)
        p, p_g = _merged_softmax(st, sg_eff, mf, gvf)
        dp = jax.lax.dot_general(
            dos, v_win, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_g = jax.lax.dot_general(
            dos, v0, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [G·BS, 1]
        r = jnp.sum(p * dp, axis=-1, keepdims=True) + p_g * dp_g
        ds = p * (dp - r)
        ds_g = p_g * (dp_g - r)                               # [G·BS, 1]
        dq_stk = (jnp.dot(ds, k_win, preferred_element_type=jnp.float32)
                  + ds_g * k0) * scale
        dq_ref[qi * BS:(qi + 1) * BS, :] = _unstack_groups(
            dq_stk, G, hd, BS).astype(dq_ref.dtype)
        # contracting over the G·BS stacked rows sums the per-group
        # outer products in one matmul each
        dk_acc[start:start + KW, :] += jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dv_acc[start:start + KW, :] += jax.lax.dot_general(
            p, dos, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk0 = dk0 + jax.lax.dot_general(
            ds_g, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # [1, W]
        dv0 = dv0 + jax.lax.dot_general(
            p_g, dos, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    # ---- global query row 0 (matches the forward's in-kernel row) ----
    q0s = _stack_groups(q_ref[0:1, :].astype(jnp.float32), G, hd)
    do0s = _stack_groups(do_ref[0:1, :].astype(jnp.float32), G, hd)
    k_all = k_ref[:, :].astype(jnp.float32)
    v_all = v_ref[:, :].astype(jnp.float32)
    s0 = jax.lax.dot_general(
        q0s, k_all, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale           # [G, S]
    m0 = jnp.concatenate(
        [(mask_ref[0, 0, :] > 0)[None, :].astype(jnp.float32)] * G, axis=0)
    st0 = jnp.where(m0 > 0, s0, NEG_INF)
    m0max = jnp.max(st0, axis=-1, keepdims=True)
    e0 = jnp.exp(st0 - m0max) * m0
    z0 = jnp.sum(e0, axis=-1, keepdims=True)
    p0 = e0 * jnp.where(z0 > 0, 1.0 / z0, 0.0)
    dp0 = jax.lax.dot_general(
        do0s, v_all, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [G, S]
    r0 = jnp.sum(p0 * dp0, axis=-1, keepdims=True)
    ds0 = p0 * (dp0 - r0)
    dq0 = jnp.dot(ds0, k_all, preferred_element_type=jnp.float32) * scale
    dq_ref[0:1, :] = _unstack_groups(dq0, G, hd, 1).astype(dq_ref.dtype)
    dk_acc[:, :] += jax.lax.dot_general(
        ds0, q0s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale           # [S, W]
    dv_acc[:, :] += jax.lax.dot_general(
        p0, do0s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_acc[0:1, :] += dk0
    dv_acc[0:1, :] += dv0
    dk_ref[:] = dk_acc[:].astype(dk_ref.dtype)
    dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


def _bmhsa_specs(B: int, S: int, W: int, n_tensors: int):
    mask_spec = pl.BlockSpec((1, 1, S), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((S, W), lambda b, h: (b, h),
                          memory_space=pltpu.VMEM)
    return mask_spec, [t_spec] * n_tensors, t_spec


def _bmhsa_kw(window: int, block_size: int, S: int) -> int:
    """Contiguous key-window width: band pad rounded up to 32 rows
    (sublane-aligned starts for every input dtype), clamped to S."""
    pad_req = -(-window // 32) * 32
    return min(block_size + 2 * pad_req, S)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _bmhsa(q, k, v, key_mask, window, block_size, KW, hd, G, S, interpret):
    return _bmhsa_fwd_impl(q, k, v, key_mask, window, block_size, KW, hd,
                           G, S, interpret)


def _bmhsa_fwd_impl(q, k, v, key_mask, window, block_size, KW, hd, G, S,
                    interpret):
    BS_, H = q.shape
    B = BS_ // S
    W = hd * G
    nb = S // block_size
    scale = 1.0 / float(hd) ** 0.5
    mask_spec, in_specs, out_spec = _bmhsa_specs(B, S, W, 3)
    kern = functools.partial(_bmhsa_fwd_kernel, nb=nb, BS=block_size,
                             KW=KW, window=window, hd=hd, G=G, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(B, H // W),
        in_specs=[mask_spec] + in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((BS_, H), q.dtype),
        interpret=interpret,
    )(key_mask.reshape(B, 1, S), q, k, v)


def _bmhsa_fwd(q, k, v, key_mask, window, block_size, KW, hd, G, S,
               interpret):
    out = _bmhsa_fwd_impl(q, k, v, key_mask, window, block_size, KW, hd,
                          G, S, interpret)
    return out, (q, k, v, key_mask)


def _bmhsa_bwd(window, block_size, KW, hd, G, S, interpret, residuals, g):
    q, k, v, key_mask = residuals
    BS_, H = q.shape
    B = BS_ // S
    W = hd * G
    nb = S // block_size
    scale = 1.0 / float(hd) ** 0.5
    mask_spec, in_specs, out_spec = _bmhsa_specs(B, S, W, 4)
    kern = functools.partial(_bmhsa_bwd_kernel, nb=nb, BS=block_size,
                             KW=KW, window=window, hd=hd, G=G, scale=scale)
    shp = jax.ShapeDtypeStruct((BS_, H), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B, H // W),
        in_specs=[mask_spec] + in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(shp, shp, shp),
        scratch_shapes=[pltpu.VMEM((S, W), jnp.float32),
                        pltpu.VMEM((S, W), jnp.float32)],
        interpret=interpret,
    )(key_mask.reshape(B, 1, S), q, k, v, g)
    return dq, dk, dv, jnp.zeros_like(key_mask)


_bmhsa.defvjp(_bmhsa_fwd, _bmhsa_bwd)


def banded_mhsa_plan(S: int, H: int, n_heads: int):
    """(hd, G) when the full-width banded kernel maps, else None:
    heads must tile 128-lane groups (or all of H when H ≤ 128)."""
    if H % n_heads:
        return None
    hd = H // n_heads
    if H <= 128:
        return hd, n_heads
    if 128 % hd == 0 and n_heads % (128 // hd) == 0:
        return hd, 128 // hd
    return None


def banded_mhsa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                key_mask: jnp.ndarray, n_heads: int, window: int,
                block_size: int = 128,
                interpret: bool = False) -> jnp.ndarray:
    """Banded local+global MHSA on UNSPLIT [B, S, H] q/k/v → [B, S, H].

    Heads separate inside the kernel (lane masking); semantics equal
    head-splitting + ``block_local_attention`` + head-merging, pinned by
    tests/test_pallas_attention.py. The global query row 0 (CLS attends
    everywhere) is exact and computed INSIDE the kernel (k/v are already
    VMEM-resident there; the round-4 outside-kernel patch cost ~0.5 ms
    fwd / ~1.5 ms bwd of einsums + a full-output HBM concat per call at
    XFormer bench shapes).
    """
    B, S, H = q.shape
    plan = banded_mhsa_plan(S, H, n_heads)
    assert plan is not None
    hd, G = plan
    assert window <= block_size
    pad = (-S) % block_size
    if pad:
        zc = ((0, 0), (0, pad), (0, 0))
        q, k, v = jnp.pad(q, zc), jnp.pad(k, zc), jnp.pad(v, zc)
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))
    Sp = S + pad
    KW = _bmhsa_kw(window, block_size, Sp)
    out = _bmhsa(q.reshape(B * Sp, H), k.reshape(B * Sp, H),
                 v.reshape(B * Sp, H), key_mask.astype(jnp.float32),
                 window, block_size, KW, hd, G, Sp, interpret)
    return out.reshape(B, Sp, H)[:, :S, :]
