"""Pallas TPU kernel: fused residual-add + LayerNorm for the 2-D stream.

On the v5e profile the encoder's LayerNorm family (stat reductions,
normalize-apply, residual adds, and their backward reductions) runs at
~90 GB/s through XLA's fusions — ~20 ms of the newsbert step
(BASELINE.md round-3 decomposition). This kernel computes
``y = LN(x + res) * scale + bias`` in ONE pass per direction:

- forward: one read of x and res, one write of y, row stats (mean, rstd)
  saved as [N, 1] side outputs (0.5 MB — far cheaper than recomputing
  them from a second 94 MB read in the backward);
- backward: one read of dy/x/res, one write of dx (which IS dres —
  the residual add distributes the same gradient to both addends),
  with dscale/dbias accumulated across the sequential grid in a
  revisited output block.

Math (per row, fp32): s = x + res; xhat = (s - mean)·rstd;
y = xhat·scale + bias;
dx = rstd·(dxhat − mean(dxhat) − xhat·mean(dxhat·xhat)),
dxhat = dy·scale;  dscale = Σ_rows dy·xhat;  dbias = Σ_rows dy.

``fused_add_ln`` dispatches: Pallas on TPU backends, the identical jnp
formulation elsewhere (which is also the exactness oracle in
tests/test_pallas_ln.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp(flag: bool):
    return pltpu.InterpretParams() if flag else False


def _fwd_kernel(x_ref, r_ref, sc_ref, b_ref, y_ref, mean_ref, rstd_ref, *,
                eps: float, has_res: bool):
    x = x_ref[:].astype(jnp.float32)
    if has_res:
        x = x + r_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    y = xhat * sc_ref[0, :].astype(jnp.float32) + \
        b_ref[0, :].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _bwd_kernel(dy_ref, x_ref, r_ref, mean_ref, rstd_ref, sc_ref,
                dx_ref, dsc_ref, db_ref, *, has_res: bool):
    i = pl.program_id(0)
    dy = dy_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    if has_res:
        x = x + r_ref[:].astype(jnp.float32)
    mean = mean_ref[:]
    rstd = rstd_ref[:]
    xhat = (x - mean) * rstd
    dxhat = dy * sc_ref[0, :].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dsc_ref[:] = jnp.zeros_like(dsc_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dsc_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)


def _pick_br(N: int, H: int, block_rows: int) -> int:
    br = min(block_rows, N)
    while N % br:
        br //= 2
    return max(br, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _add_ln(x, res, scale, bias, eps, has_res, br, interpret):
    y, _, _ = _add_ln_fwd_impl(x, res, scale, bias, eps, has_res, br,
                               interpret)
    return y


def _add_ln_fwd_impl(x, res, scale, bias, eps, has_res, br, interpret):
    N, H = x.shape
    row = pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(_fwd_kernel, eps=eps, has_res=has_res)
    y, mean, rstd = pl.pallas_call(
        kern,
        grid=(N // br,),
        in_specs=[row, row, vec, vec],
        out_specs=(row, stat, stat),
        out_shape=(jax.ShapeDtypeStruct((N, H), x.dtype),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32)),
        interpret=_interp(interpret),
    )(x, res, scale.reshape(1, H), bias.reshape(1, H))
    return y, mean, rstd


def _add_ln_fwd(x, res, scale, bias, eps, has_res, br, interpret):
    y, mean, rstd = _add_ln_fwd_impl(x, res, scale, bias, eps, has_res,
                                     br, interpret)
    return y, (x, res, scale, mean, rstd)


def _add_ln_bwd(eps, has_res, br, interpret, residuals, dy):
    x, res, scale, mean, rstd = residuals
    N, H = x.shape
    row = pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_kernel, has_res=has_res)
    dx, dsc, db = pl.pallas_call(
        kern,
        grid=(N // br,),
        in_specs=[row, row, row, stat, stat, vec],
        out_specs=(row, vec, vec),
        out_shape=(jax.ShapeDtypeStruct((N, H), x.dtype),
                   jax.ShapeDtypeStruct((1, H), jnp.float32),
                   jax.ShapeDtypeStruct((1, H), jnp.float32)),
        interpret=_interp(interpret),
    )(dy, x, res, mean, rstd, scale.reshape(1, H))
    dres = dx if has_res else jnp.zeros_like(res)
    return (dx, dres, dsc.reshape(H).astype(scale.dtype),
            db.reshape(H).astype(scale.dtype))


_add_ln.defvjp(_add_ln_fwd, _add_ln_bwd)


def _jnp_reference(x, res, scale, bias, eps):
    s = x.astype(jnp.float32)
    if res is not None:
        s = s + res.astype(jnp.float32)
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(s * s, axis=-1, keepdims=True) - mean * mean
    xhat = (s - mean) * jax.lax.rsqrt(var + eps)
    y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def fused_add_ln(x: jnp.ndarray, res, scale: jnp.ndarray,
                 bias: jnp.ndarray, eps: float = 1e-12,
                 block_rows: int = 256, interpret: bool = False,
                 force_kernel: bool = False) -> jnp.ndarray:
    """``LayerNorm(x + res) * scale + bias`` over rows of [N, H]
    (``res=None`` for a plain LN). Pallas on TPU; jnp elsewhere."""
    N, H = x.shape
    use_kernel = force_kernel or jax.default_backend() in ("tpu", "axon")
    # res=None stays on the jnp path: a dummy operand would still be
    # DMA'd per block, wasting the bandwidth the kernel exists to save
    if not use_kernel or res is None or H % 128 or N % 8:
        return _jnp_reference(x, res, scale, bias, eps)
    br = _pick_br(N, H, block_rows)
    return _add_ln(x, res, scale, bias, float(eps), True, br, interpret)
