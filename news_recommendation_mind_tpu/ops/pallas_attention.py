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


# ---------------------------------------------------------------------------
# BigBird block-sparse MHSA (round 5)
#
# The reference's bigbird variants get HF BigBird's block-sparse CUDA
# kernels (reference models/PLM.py:66-78, BigBirdConfig(block_size=64,
# num_random_blocks=3)). An XLA gather realization (each query block
# gathers its {sliding, global, random} key blocks) was measured SLOWER
# than dense masked O(S²) attention on the v5e (374 vs 280 ms/step at
# XFormer bigbird bench shapes): the per-query-block gathers duplicate
# key movement ~7× and produce [64, 448]·[448, 64]-scale matmuls that
# underfill the MXU. This kernel executes the same pattern with ZERO
# gathers by reusing the banded_mhsa machinery — k/v live in VMEM per
# (batch, head-group) grid cell, so every "gather" is a slice:
#
# - sliding window: one contiguous 3·block key slice per query block
#   (block-level |qb−kb| ≤ 1 mask, key block 0 excluded),
# - global key block 0: a [·, block] strip scored for every query row,
# - random blocks: per-HEAD static-at-trace block ids, delivered as
#   SMEM scalars and sliced with 64-row-aligned dynamic starts
#   (pl.multiple_of) — per head because the cell's G lane-groups carry
#   different heads,
# - global query block 0 (attends everything): dense [G·block, S]
#   in-kernel, like banded_mhsa's global row.
#
# One joint masked softmax (fp32) runs over the concatenated
# [window | global | random] columns — exactly the dense-mask
# formulation's probabilities (the pattern builder guarantees the three
# parts are disjoint). Attention-prob dropout is skipped on this path,
# matching the banded kernel's documented convention. Backward is the
# same flash-style recompute with VMEM dk/dv accumulators; random-block
# gradients accumulate through dynamic-start RMW slices.
# ---------------------------------------------------------------------------


def _bb_parts(mask_ref, q_ref, k_ref, rand_ref, rkv_ref, qi, *,
              nb, BB, hd, G, scale):
    """Scores + masks for query block qi ≥ 1: returns (qs, s_all, m_all,
    win_start, rbs) where s_all/m_all = [G·BB, 3BB + BB + NR·BB]."""
    S, W = q_ref.shape
    NR = rand_ref.shape[-1]
    win_start = min(max((qi - 1) * BB, 0), S - 3 * BB)
    qs = _stack_groups(q_ref[qi * BB:(qi + 1) * BB, :]
                       .astype(jnp.float32), G, hd)
    # sliding window (3 contiguous blocks; block-level mask, kb != 0)
    k_win = k_ref[win_start:win_start + 3 * BB, :].astype(jnp.float32)
    s_win = jax.lax.dot_general(
        qs, k_win, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    kb = (win_start // BB
          + jax.lax.broadcasted_iota(jnp.int32, (BB, 3 * BB), 1) // BB)
    kvalid_win = mask_ref[0, 0, win_start:win_start + 3 * BB] > 0
    m_win = ((jnp.abs(kb - qi) <= 1) & (kb != 0) & kvalid_win[None, :])
    m_win = jnp.concatenate([m_win.astype(jnp.float32)] * G, axis=0)
    # global key block 0
    k_glob = k_ref[0:BB, :].astype(jnp.float32)
    s_glob = jax.lax.dot_general(
        qs, k_glob, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    m_glob = (mask_ref[0, 0, 0:BB] > 0).astype(jnp.float32)[None, :]
    m_glob = jnp.broadcast_to(m_glob, (G * BB, BB))
    # per-head random blocks: k/v via dynamic 64-row-aligned SUBLANE
    # slices; the key-validity columns come pre-gathered per
    # (head, query block) in rkv_ref (a dynamic LANE slice of the mask
    # is unprovable for Mosaic, so it is built outside the kernel)
    s_rand_parts, m_rand_parts, rbs = [], [], []
    for g in range(G):
        qg = qs[g * BB:(g + 1) * BB, :]
        srs, rb_g = [], []
        for r in range(NR):
            rb = pl.multiple_of(
                rand_ref[g, qi - 1, r].astype(jnp.int32) * BB, BB)
            rb_g.append(rb)
            k_r = k_ref[pl.ds(rb, BB), :].astype(jnp.float32)
            srs.append(jax.lax.dot_general(
                qg, k_r, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
        s_rand_parts.append(jnp.concatenate(srs, axis=1))
        m_rand_parts.append(jnp.broadcast_to(
            rkv_ref[0, g, qi - 1, :][None, :], (BB, NR * BB)))
        rbs.append(rb_g)
    s_rand = jnp.concatenate(s_rand_parts, axis=0)      # [G·BB, NR·BB]
    m_rand = jnp.concatenate(m_rand_parts, axis=0)
    s_all = jnp.concatenate([s_win, s_glob, s_rand], axis=1)
    m_all = jnp.concatenate([m_win, m_glob, m_rand], axis=1)
    return qs, s_all, m_all, win_start, rbs


def _bb_softmax(s_all, m_all):
    st = jnp.where(m_all > 0, s_all, NEG_INF)
    smax = jnp.max(st, axis=-1, keepdims=True)
    e = jnp.exp(st - smax) * m_all
    z = jnp.sum(e, axis=-1, keepdims=True)
    return e * jnp.where(z > 0, 1.0 / z, 0.0)


def _bb_global_block(mask_ref, q_ref, k_ref, *, BB, hd, G, scale):
    """Dense scores for query block 0 (attends every valid key)."""
    S, W = q_ref.shape
    q0s = _stack_groups(q_ref[0:BB, :].astype(jnp.float32), G, hd)
    k_all = k_ref[:, :].astype(jnp.float32)
    s0 = jax.lax.dot_general(
        q0s, k_all, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale     # [G·BB, S]
    m0 = (mask_ref[0, 0, :] > 0).astype(jnp.float32)[None, :]
    m0 = jnp.broadcast_to(m0, (G * BB, S))
    return q0s, s0, m0, k_all


def _bb_fwd_kernel(rand_ref, rkv_ref, mask_ref, q_ref, k_ref, v_ref,
                   o_ref, *, nb, BB, hd, G, scale):
    S, W = q_ref.shape
    NR = rand_ref.shape[-1]
    for qi in range(1, nb):
        qs, s_all, m_all, win_start, rbs = _bb_parts(
            mask_ref, q_ref, k_ref, rand_ref, rkv_ref, qi,
            nb=nb, BB=BB, hd=hd, G=G, scale=scale)
        p = _bb_softmax(s_all, m_all)
        v_win = v_ref[win_start:win_start + 3 * BB, :].astype(jnp.float32)
        v_glob = v_ref[0:BB, :].astype(jnp.float32)
        o_stk = jnp.dot(p[:, :3 * BB], v_win,
                        preferred_element_type=jnp.float32)
        o_stk += jnp.dot(p[:, 3 * BB:4 * BB], v_glob,
                         preferred_element_type=jnp.float32)
        o_rand = []
        for g in range(G):
            og = jnp.zeros((BB, W), jnp.float32)
            for r in range(NR):
                v_r = v_ref[pl.ds(rbs[g][r], BB), :].astype(jnp.float32)
                pg = p[g * BB:(g + 1) * BB,
                       (4 + r) * BB:(5 + r) * BB]
                og += jnp.dot(pg, v_r,
                              preferred_element_type=jnp.float32)
            o_rand.append(og)
        o_stk += jnp.concatenate(o_rand, axis=0)
        o_ref[qi * BB:(qi + 1) * BB, :] = _unstack_groups(
            o_stk, G, hd, BB).astype(o_ref.dtype)
    # global query block 0
    q0s, s0, m0, _ = _bb_global_block(mask_ref, q_ref, k_ref,
                                      BB=BB, hd=hd, G=G, scale=scale)
    p0 = _bb_softmax(s0, m0)
    v_all = v_ref[:, :].astype(jnp.float32)
    o0 = jnp.dot(p0, v_all, preferred_element_type=jnp.float32)
    o_ref[0:BB, :] = _unstack_groups(o0, G, hd, BB).astype(o_ref.dtype)


def _bb_bwd_kernel(rand_ref, rkv_ref, mask_ref, q_ref, k_ref, v_ref,
                   do_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                   nb, BB, hd, G, scale):
    S, W = q_ref.shape
    NR = rand_ref.shape[-1]
    dk_acc[:] = jnp.zeros_like(dk_acc)
    dv_acc[:] = jnp.zeros_like(dv_acc)
    for qi in range(1, nb):
        qs, s_all, m_all, win_start, rbs = _bb_parts(
            mask_ref, q_ref, k_ref, rand_ref, rkv_ref, qi,
            nb=nb, BB=BB, hd=hd, G=G, scale=scale)
        p = _bb_softmax(s_all, m_all)
        dos = _stack_groups(do_ref[qi * BB:(qi + 1) * BB, :]
                            .astype(jnp.float32), G, hd)
        v_win = v_ref[win_start:win_start + 3 * BB, :].astype(jnp.float32)
        v_glob = v_ref[0:BB, :].astype(jnp.float32)
        dp_win = jax.lax.dot_general(
            dos, v_win, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_glob = jax.lax.dot_general(
            dos, v_glob, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_rand_parts = []
        for g in range(G):
            dog = dos[g * BB:(g + 1) * BB, :]
            drs = []
            for r in range(NR):
                v_r = v_ref[pl.ds(rbs[g][r], BB), :].astype(jnp.float32)
                drs.append(jax.lax.dot_general(
                    dog, v_r, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
            dp_rand_parts.append(jnp.concatenate(drs, axis=1))
        dp = jnp.concatenate(
            [dp_win, dp_glob, jnp.concatenate(dp_rand_parts, axis=0)],
            axis=1)
        rsum = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - rsum)
        # dq
        k_win = k_ref[win_start:win_start + 3 * BB, :].astype(jnp.float32)
        k_glob = k_ref[0:BB, :].astype(jnp.float32)
        dq_stk = jnp.dot(ds[:, :3 * BB], k_win,
                         preferred_element_type=jnp.float32)
        dq_stk += jnp.dot(ds[:, 3 * BB:4 * BB], k_glob,
                          preferred_element_type=jnp.float32)
        dq_rand = []
        for g in range(G):
            dqg = jnp.zeros((BB, W), jnp.float32)
            for r in range(NR):
                k_r = k_ref[pl.ds(rbs[g][r], BB), :].astype(jnp.float32)
                dsg = ds[g * BB:(g + 1) * BB, (4 + r) * BB:(5 + r) * BB]
                dqg += jnp.dot(dsg, k_r,
                               preferred_element_type=jnp.float32)
            dq_rand.append(dqg)
        dq_stk += jnp.concatenate(dq_rand, axis=0)
        dq_ref[qi * BB:(qi + 1) * BB, :] = _unstack_groups(
            dq_stk * scale, G, hd, BB).astype(dq_ref.dtype)
        # dk/dv accumulation
        dk_acc[win_start:win_start + 3 * BB, :] += jax.lax.dot_general(
            ds[:, :3 * BB], qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dv_acc[win_start:win_start + 3 * BB, :] += jax.lax.dot_general(
            p[:, :3 * BB], dos, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_acc[0:BB, :] += jax.lax.dot_general(
            ds[:, 3 * BB:4 * BB], qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dv_acc[0:BB, :] += jax.lax.dot_general(
            p[:, 3 * BB:4 * BB], dos, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for g in range(G):
            qg = qs[g * BB:(g + 1) * BB, :]
            dog = dos[g * BB:(g + 1) * BB, :]
            for r in range(NR):
                sl = pl.ds(rbs[g][r], BB)
                dsg = ds[g * BB:(g + 1) * BB, (4 + r) * BB:(5 + r) * BB]
                pg = p[g * BB:(g + 1) * BB, (4 + r) * BB:(5 + r) * BB]
                dk_acc[sl, :] += jax.lax.dot_general(
                    dsg, qg, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                dv_acc[sl, :] += jax.lax.dot_general(
                    pg, dog, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    # global query block 0
    q0s, s0, m0, k_all = _bb_global_block(mask_ref, q_ref, k_ref,
                                          BB=BB, hd=hd, G=G, scale=scale)
    p0 = _bb_softmax(s0, m0)
    do0s = _stack_groups(do_ref[0:BB, :].astype(jnp.float32), G, hd)
    v_all = v_ref[:, :].astype(jnp.float32)
    dp0 = jax.lax.dot_general(
        do0s, v_all, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    r0 = jnp.sum(p0 * dp0, axis=-1, keepdims=True)
    ds0 = p0 * (dp0 - r0)
    dq0 = jnp.dot(ds0, k_all, preferred_element_type=jnp.float32) * scale
    dq_ref[0:BB, :] = _unstack_groups(dq0, G, hd, BB).astype(dq_ref.dtype)
    dk_acc[:, :] += jax.lax.dot_general(
        ds0, q0s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dv_acc[:, :] += jax.lax.dot_general(
        p0, do0s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_ref[:] = dk_acc[:].astype(dk_ref.dtype)
    dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


def _bb_specs(B, S, W, G, nbq, NR, BB, n_tensors):
    rand_spec = pl.BlockSpec((G, max(nbq, 1), max(NR, 1)),
                             lambda b, h: (h, 0, 0),
                             memory_space=pltpu.SMEM)
    rkv_spec = pl.BlockSpec((1, G, max(nbq, 1), max(NR, 1) * BB),
                            lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, S), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((S, W), lambda b, h: (b, h),
                          memory_space=pltpu.VMEM)
    return rand_spec, rkv_spec, mask_spec, [t_spec] * n_tensors, t_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _bb_mhsa(q, k, v, key_mask, rand, rkv, block, hd, G, S, interpret):
    return _bb_fwd_impl(q, k, v, key_mask, rand, rkv, block, hd, G, S,
                        interpret)


def _bb_fwd_impl(q, k, v, key_mask, rand, rkv, block, hd, G, S,
                 interpret):
    BS_, H = q.shape
    B = BS_ // S
    W = hd * G
    nb = S // block
    n_groups = H // W
    NR = rand.shape[-1]
    scale = 1.0 / float(hd) ** 0.5
    rand_spec, rkv_spec, mask_spec, in_specs, out_spec = _bb_specs(
        B, S, W, G, nb - 1, NR, block, 3)
    kern = functools.partial(_bb_fwd_kernel, nb=nb, BB=block, hd=hd,
                             G=G, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(B, n_groups),
        in_specs=[rand_spec, rkv_spec] + [mask_spec] + in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((BS_, H), q.dtype),
        interpret=interpret,
    )(rand, rkv, key_mask.reshape(B, 1, S), q, k, v)


def _bb_fwd(q, k, v, key_mask, rand, rkv, block, hd, G, S, interpret):
    out = _bb_fwd_impl(q, k, v, key_mask, rand, rkv, block, hd, G, S,
                       interpret)
    return out, (q, k, v, key_mask, rand, rkv)


def _bb_bwd(block, hd, G, S, interpret, residuals, g):
    q, k, v, key_mask, rand, rkv = residuals
    BS_, H = q.shape
    B = BS_ // S
    W = hd * G
    nb = S // block
    n_groups = H // W
    NR = rand.shape[-1]
    scale = 1.0 / float(hd) ** 0.5
    rand_spec, rkv_spec, mask_spec, in_specs, out_spec = _bb_specs(
        B, S, W, G, nb - 1, NR, block, 4)
    kern = functools.partial(_bb_bwd_kernel, nb=nb, BB=block, hd=hd,
                             G=G, scale=scale)
    shp = jax.ShapeDtypeStruct((BS_, H), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B, n_groups),
        in_specs=[rand_spec, rkv_spec] + [mask_spec] + in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(shp, shp, shp),
        scratch_shapes=[pltpu.VMEM((S, W), jnp.float32),
                        pltpu.VMEM((S, W), jnp.float32)],
        interpret=interpret,
    )(rand, rkv, key_mask.reshape(B, 1, S), q, k, v, g)
    return (dq, dk, dv, jnp.zeros_like(key_mask), jnp.zeros_like(rand),
            jnp.zeros_like(rkv))


_bb_mhsa.defvjp(_bb_fwd, _bb_bwd)


def bigbird_rand_tables(pattern, n_heads: int):
    """Random-only block ids per (head, query block ≥ 1) from the
    [nh, nb, nb] bool pattern: (rand [nh, nb-1, NR] int32,
    rmask [nh, nb-1, NR] float32). Dead slots point at block 1 with a
    zero mask. NR = the max random count (3 at reference configs)."""
    import numpy as np
    pat = np.asarray(pattern, bool)
    nh, nb, _ = pat.shape
    idx = np.arange(nb)
    rand_rows = []
    for h in range(nh):
        rows = []
        for qb in range(1, nb):
            rnd = np.nonzero(pat[h, qb] & (np.abs(idx - qb) > 1)
                             & (idx != 0))[0]
            rows.append(rnd)
        rand_rows.append(rows)
    NR = max((len(r) for rows in rand_rows for r in rows), default=0)
    NR = max(NR, 1)
    rand = np.ones((nh, nb - 1, NR), np.int32)
    rmask = np.zeros((nh, nb - 1, NR), np.float32)
    for h in range(nh):
        for i, rnd in enumerate(rand_rows[h]):
            rand[h, i, :len(rnd)] = rnd
            rmask[h, i, :len(rnd)] = 1.0
    return rand, rmask


def bigbird_mhsa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 key_mask: jnp.ndarray, n_heads: int, pattern,
                 block: int, interpret: bool = False) -> jnp.ndarray:
    """BigBird block-sparse MHSA on UNSPLIT [B, S, H] q/k/v → [B, S, H].

    Executes the static per-head pattern with zero gathers (see the
    section comment above); semantics equal the dense-mask formulation
    in models/bert.py (masked_softmax conventions), pinned by
    tests/test_pallas_attention.py::test_bigbird_mhsa_matches_dense.
    Attention-prob dropout is skipped (banded-kernel convention).
    """
    B, S, H = q.shape
    plan = banded_mhsa_plan(S, H, n_heads)
    assert plan is not None
    hd, G = plan
    nb = pattern.shape[1]
    Sp = nb * block
    if Sp != S:
        zc = ((0, 0), (0, Sp - S), (0, 0))
        q, k, v = jnp.pad(q, zc), jnp.pad(k, zc), jnp.pad(v, zc)
        key_mask = jnp.pad(key_mask, ((0, 0), (0, Sp - S)))
    rand, rmask = bigbird_rand_tables(pattern, n_heads)
    NR = rand.shape[-1]
    nbq = max(nb - 1, 1)
    # random-block key validity, pre-gathered per (head, query block):
    # rkv[b, h, i, r·BB + t] = key_mask[b, rand[h,i,r]·BB + t] · rmask —
    # Mosaic cannot prove alignment for a dynamic LANE slice of the
    # mask, so these columns are assembled outside the kernel (a tiny
    # XLA gather) and read with static slices inside
    import numpy as _np
    pos = (rand[..., :, None] * block
           + _np.arange(block)[None, None, None, :])   # [nh, nbq, NR, BB]
    kmf = key_mask.astype(jnp.float32)
    rkv = (kmf[:, pos.reshape(rand.shape[0], nbq, NR * block)]
           * jnp.asarray(rmask, jnp.float32).repeat(block, axis=-1)
           [None])                                     # [B, nh, nbq, NR·BB]
    # rand ships as f32 (cast back in-kernel): custom_vjp cotangents
    # for integer operands are float0, which the bwd can't construct
    out = _bb_mhsa(q.reshape(B * Sp, H), k.reshape(B * Sp, H),
                   v.reshape(B * Sp, H), kmf,
                   jnp.asarray(rand, jnp.float32), rkv,
                   block, hd, G, Sp, interpret)
    return out.reshape(B, Sp, H)[:, :S, :]
