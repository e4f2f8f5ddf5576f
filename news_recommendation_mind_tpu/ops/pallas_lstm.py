"""Fused Pallas LSTM: the whole time loop in one TPU kernel.

The cuDNN-LSTM replacement promised in SURVEY §2.9. Design (v2, measured
against the `lax.scan` version on a v5e):

- the input projection for all timesteps is ONE [B*T, D]x[D, 4H] MXU
  matmul outside the kernel (XLA);
- the kernel's *grid is the time axis*: TPU grids execute sequentially on
  a core, so Pallas auto-double-buffers each step's gate block
  ([4, B, H]) from HBM while the previous step computes, and the h/c
  carries persist in VMEM scratch across grid steps — no HBM round-trip
  for the recurrence, full-batch [B, H]x[H, H] MXU matmuls per gate;
- gates sit on a separate leading axis ([T, 4, B, H] activations,
  [4, H, H] weights): Mosaic forbids lane-dimension slices at non-128
  offsets (H=150), so the i/f/g/o split is an aligned leading index;
- custom VJP: the backward kernel walks the grid in reverse (index_map
  T-1-t), recomputing gates from the saved h/c sequences, emitting dxg
  (XLA backprops it through the input matmul) and accumulating dw_hh in
  scratch, published at the final grid step.

Numerics match ops/rnn.py's lstm_scan (same gate math/ordering as torch),
which remains the CPU fallback. `lstm_auto` picks the kernel on TPU and
the scan elsewhere.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rnn import lstm_scan


def _gates(xg_t, h, w_ref):
    i = jax.nn.sigmoid(xg_t[0] + jnp.dot(
        h, w_ref[0], preferred_element_type=jnp.float32))
    f = jax.nn.sigmoid(xg_t[1] + jnp.dot(
        h, w_ref[1], preferred_element_type=jnp.float32))
    g = jnp.tanh(xg_t[2] + jnp.dot(
        h, w_ref[2], preferred_element_type=jnp.float32))
    o = jax.nn.sigmoid(xg_t[3] + jnp.dot(
        h, w_ref[3], preferred_element_type=jnp.float32))
    return i, f, g, o


def _fwd_kernel(xg_ref, w_ref, mask_ref, h0_ref, c0_ref,
                out_ref, call_ref, h_s, c_s):
    # grid = (T//K,); xg_ref [K,4,B,H]; mask_ref [K,B,1]; out/call [K,B,H]
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    K = xg_ref.shape[0]

    def inner(k, _):
        i, f, g, o = _gates(xg_ref[k], h_s[:], w_ref)
        c_new = f * c_s[:] + i * g
        h_new = o * jnp.tanh(c_new)
        m = mask_ref[k]
        h_s[:] = m * h_new + (1 - m) * h_s[:]
        c_s[:] = m * c_new + (1 - m) * c_s[:]
        out_ref[k] = h_s[:]
        call_ref[k] = c_s[:]
        return 0

    jax.lax.fori_loop(0, K, inner, 0)


def _bwd_kernel(xg_ref, w_ref, mask_ref, h0_ref, c0_ref, hprev_ref,
                cprev_ref, gout_ref, ghT_ref, gcT_ref,
                dxg_ref, dw_ref, dh0_ref, dc0_ref,
                dh_s, dc_s, dw_s):
    # grid = (T,) walked in reverse via index maps; *prev_ref hold the
    # state *entering* step t (h_{t-1}/c_{t-1}, with h0/c0 at t=0)
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_s[:] = ghT_ref[:]
        dc_s[:] = gcT_ref[:]
        dw_s[:] = jnp.zeros_like(dw_s)

    K = xg_ref.shape[0]

    def inner(kk, _):
        k = K - 1 - kk          # blocks arrive reversed; walk inside too
        h_prev = hprev_ref[k]
        c_prev = cprev_ref[k]
        i, f, g, o = _gates(xg_ref[k], h_prev, w_ref)
        c_new = f * c_prev + i * g
        tanh_c = jnp.tanh(c_new)

        m = mask_ref[k]
        dh_t = dh_s[:] + gout_ref[k]
        dh_new = m * dh_t
        dc_new = m * dc_s[:] + dh_new * o * (1 - tanh_c * tanh_c)
        dgi = (dc_new * g) * i * (1 - i)
        dgf = (dc_new * c_prev) * f * (1 - f)
        dgg = (dc_new * i) * (1 - g * g)
        dgo = (dh_new * tanh_c) * o * (1 - o)
        dxg_ref[k, 0] = dgi
        dxg_ref[k, 1] = dgf
        dxg_ref[k, 2] = dgg
        dxg_ref[k, 3] = dgo
        hT_ = h_prev.T
        dw_s[0] += jnp.dot(hT_, dgi, preferred_element_type=jnp.float32)
        dw_s[1] += jnp.dot(hT_, dgf, preferred_element_type=jnp.float32)
        dw_s[2] += jnp.dot(hT_, dgg, preferred_element_type=jnp.float32)
        dw_s[3] += jnp.dot(hT_, dgo, preferred_element_type=jnp.float32)
        dh_s[:] = ((1 - m) * dh_t
                   + jnp.dot(dgi, w_ref[0].T, preferred_element_type=jnp.float32)
                   + jnp.dot(dgf, w_ref[1].T, preferred_element_type=jnp.float32)
                   + jnp.dot(dgg, w_ref[2].T, preferred_element_type=jnp.float32)
                   + jnp.dot(dgo, w_ref[3].T, preferred_element_type=jnp.float32))
        dc_s[:] = (1 - m) * dc_s[:] + dc_new * f
        return 0

    jax.lax.fori_loop(0, K, inner, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = dw_s[:]
        dh0_ref[:] = dh_s[:]
        dc0_ref[:] = dc_s[:]


# xg4: [T, 4, B, H]; w4: [4, H, H]; mask3: [T, B, 1]; h0/c0: [B, H]
@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _lstm_core(xg4, w4, h0, c0, mask3, interpret: bool):
    out, c_all = _lstm_fwd_call(xg4, w4, h0, c0, mask3, interpret)
    return out, out[:, -1], c_all[:, -1]


def _vm(block, index_map):
    return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)


def _chunk(T: int, B: int, H: int) -> int:
    """Timesteps per grid step: amortize grid overhead under the VMEM cap.

    Per-K footprint ≈ (4 gate + 2 output) blocks of [B, Hp] f32 with
    lane padding Hp = ceil(H/128)*128, with pipeline double-buffering;
    keep the estimate under ~10 MB of the 16 MB VMEM.
    """
    hp = -(-H // 128) * 128
    per_k_mb = 6 * B * hp * 4 * 1.7 / 2 ** 20
    for k in (10, 8, 5, 4, 2):
        if T % k == 0 and T >= 2 * k and k * per_k_mb <= 10.0:
            return k
    return 1


def _lstm_fwd_call(xg4, w4, h0, c0, mask3, interpret):
    T, _, B, H = xg4.shape
    K = _chunk(T, B, H)
    out_t, call_t = pl.pallas_call(
        _fwd_kernel,
        grid=(T // K,),
        in_specs=[
            _vm((K, 4, B, H), lambda t: (t, 0, 0, 0)),
            _vm((4, H, H), lambda t: (0, 0, 0)),
            _vm((K, B, 1), lambda t: (t, 0, 0)),
            _vm((B, H), lambda t: (0, 0)),
            _vm((B, H), lambda t: (0, 0)),
        ],
        out_specs=[
            _vm((K, B, H), lambda t: (t, 0, 0)),
            _vm((K, B, H), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), xg4.dtype),
            jax.ShapeDtypeStruct((T, B, H), xg4.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xg4, w4, mask3, h0, c0)
    return jnp.swapaxes(out_t, 0, 1), jnp.swapaxes(call_t, 0, 1)


def _lstm_core_fwd(xg4, w4, h0, c0, mask3, interpret):
    out, c_all = _lstm_fwd_call(xg4, w4, h0, c0, mask3, interpret)
    res = (xg4, w4, h0, c0, mask3, out, c_all)
    return (out, out[:, -1], c_all[:, -1]), res


def _lstm_core_bwd(interpret, res, grads):
    xg4, w4, h0, c0, mask3, h_all, c_all = res
    g_out, g_hT, g_cT = grads
    T, _, B, H = xg4.shape
    swap = lambda a: jnp.swapaxes(a, 0, 1)
    # state entering step t: [h0, h_0..h_{T-2}], same for c
    h_prev_seq = jnp.concatenate([h0[None], swap(h_all)[:-1]], axis=0)
    c_prev_seq = jnp.concatenate([c0[None], swap(c_all)[:-1]], axis=0)
    K = _chunk(T, B, H)
    ng = T // K
    rev = lambda t: (ng - 1 - t, 0, 0)
    rev4 = lambda t: (ng - 1 - t, 0, 0, 0)
    dxg4, dw4, dh0, dc0 = pl.pallas_call(
        _bwd_kernel,
        grid=(ng,),
        in_specs=[
            _vm((K, 4, B, H), rev4),
            _vm((4, H, H), lambda t: (0, 0, 0)),
            _vm((K, B, 1), rev),
            _vm((B, H), lambda t: (0, 0)),
            _vm((B, H), lambda t: (0, 0)),
            _vm((K, B, H), rev),
            _vm((K, B, H), rev),
            _vm((K, B, H), rev),
            _vm((B, H), lambda t: (0, 0)),
            _vm((B, H), lambda t: (0, 0)),
        ],
        out_specs=[
            _vm((K, 4, B, H), rev4),
            _vm((4, H, H), lambda t: (0, 0, 0)),
            _vm((B, H), lambda t: (0, 0)),
            _vm((B, H), lambda t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 4, B, H), xg4.dtype),
            jax.ShapeDtypeStruct((4, H, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), xg4.dtype),
            jax.ShapeDtypeStruct((B, H), xg4.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((4, H, H), jnp.float32),
        ],
        interpret=interpret,
    )(xg4, w4, mask3, h0, c0, h_prev_seq, c_prev_seq,
      swap(g_out), g_hT, g_cT)
    return (dxg4, dw4.astype(w4.dtype), dh0, dc0, None)


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


def lstm_fused(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
               mask: Optional[jnp.ndarray] = None,
               h0: Optional[jnp.ndarray] = None,
               c0: Optional[jnp.ndarray] = None,
               interpret: bool = False,
               block_b: int = 0,  # kept for API compat; unused in v2
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.rnn.lstm_scan via the Pallas kernel."""
    B, T, _ = x.shape
    H = params["w_hh"].shape[0]
    dtype = jnp.float32  # kernel math in f32; cast at the boundary
    xg = (x.reshape(B * T, -1) @ params["w_ih"]
          + params["b_ih"] + params["b_hh"])
    # [B, T, 4H] → [T, 4, B, H]: gate split on a leading (aligned) axis
    xg4 = xg.reshape(B, T, 4, H).transpose(1, 2, 0, 3).astype(dtype)
    w4 = params["w_hh"].reshape(H, 4, H).transpose(1, 0, 2).astype(dtype)
    if mask is None:
        mask = jnp.ones((B, T), dtype)
    mask3 = jnp.swapaxes(mask.astype(dtype), 0, 1)[:, :, None]
    if h0 is None:
        h0 = jnp.zeros((B, H), dtype)
    if c0 is None:
        c0 = jnp.zeros((B, H), dtype)
    out, hT, cT = _lstm_core(xg4, w4, h0.astype(dtype), c0.astype(dtype),
                             mask3, interpret)
    odt = x.dtype
    return out.astype(odt), hT.astype(odt), cT.astype(odt)


def lstm_auto(params, x, mask=None, h0=None, c0=None, reverse=False,
              prefer_fused: bool = False):
    """Select an LSTM implementation.

    Measured on the v5e (B=256, T=50, H=150): the Pallas kernel matches
    `lax.scan` exactly on forward numerics and speed (~1.0 ms) but the
    backward is ~30% slower (XLA's scan transpose pipeline wins at this
    size), so the scan remains the default; pass prefer_fused=True on TPU
    to use the kernel (e.g. inference sweeps or much longer sequences
    where the VMEM-resident carry pays off).
    """
    backend = jax.default_backend()
    if prefer_fused and backend == "tpu" and not reverse:
        return lstm_fused(params, x, mask=mask, h0=h0, c0=c0)
    return lstm_scan(params, x, mask=mask, h0=h0, c0=c0, reverse=reverse)
