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


def _keep_bits(shape, p_drop: float, seed_ref, block):
    """Hardware-PRNG keep mask, seeded per (seed, grid block) so fwd and
    bwd regenerate identical bits (the pallas_mhsa pattern)."""
    pltpu.prng_seed(seed_ref[0], block)
    bits = pltpu.prng_random_bits(shape).astype(jnp.uint32)
    thresh = jnp.uint32(int(round((1.0 - p_drop) * float(2 ** 32 - 1))))
    return bits <= thresh


def _res_value(r_ref, seed_ref, p_drop: float, block):
    """Residual addend, with inverted dropout applied in-register when
    p_drop > 0 — the separate nn.Dropout pass (one extra read+write of
    the [N, H] stream per sublayer, ~5 ms of the newsbert step) folds
    into the LN's existing single pass."""
    r = r_ref[:].astype(jnp.float32)
    if p_drop > 0.0:
        keep = _keep_bits(r.shape, p_drop, seed_ref, block)
        r = jnp.where(keep, r / (1.0 - p_drop), 0.0)
    return r


def _fwd_kernel(seed_ref, x_ref, r_ref, sc_ref, b_ref, y_ref, mean_ref,
                rstd_ref, *, eps: float, has_res: bool, p_drop: float):
    x = x_ref[:].astype(jnp.float32)
    if has_res:
        x = x + _res_value(r_ref, seed_ref, p_drop, pl.program_id(0))
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    y = xhat * sc_ref[0, :].astype(jnp.float32) + \
        b_ref[0, :].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _bwd_kernel(seed_ref, dy_ref, x_ref, r_ref, mean_ref, rstd_ref, sc_ref,
                dx_ref, dsc_ref, db_ref, *, has_res: bool, p_drop: float,
                dr_ref=None):
    i = pl.program_id(0)
    dy = dy_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    keep = None
    if has_res:
        r = r_ref[:].astype(jnp.float32)
        if p_drop > 0.0:
            keep = _keep_bits(r.shape, p_drop, seed_ref, i)
            r = jnp.where(keep, r / (1.0 - p_drop), 0.0)
        x = x + r
    mean = mean_ref[:]
    rstd = rstd_ref[:]
    xhat = (x - mean) * rstd
    dxhat = dy * sc_ref[0, :].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    if dr_ref is not None:
        # dropout makes d(res) != d(x): the mask gates the gradient
        dr = jnp.where(keep, dx / (1.0 - p_drop), 0.0)
        dr_ref[:] = dr.astype(dr_ref.dtype)

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _add_ln(x, res, scale, bias, seed, eps, has_res, p_drop, br,
            interpret):
    y, _, _ = _add_ln_fwd_impl(x, res, scale, bias, seed, eps, has_res,
                               p_drop, br, interpret)
    return y


def _add_ln_fwd_impl(x, res, scale, bias, seed, eps, has_res, p_drop, br,
                     interpret):
    N, H = x.shape
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    row = pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(_fwd_kernel, eps=eps, has_res=has_res,
                             p_drop=p_drop)
    y, mean, rstd = pl.pallas_call(
        kern,
        grid=(N // br,),
        in_specs=[seed_spec, row, row, vec, vec],
        out_specs=(row, stat, stat),
        out_shape=(jax.ShapeDtypeStruct((N, H), x.dtype),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32)),
        interpret=_interp(interpret),
    )(seed, x, res, scale.reshape(1, H), bias.reshape(1, H))
    return y, mean, rstd


def _add_ln_fwd(x, res, scale, bias, seed, eps, has_res, p_drop, br,
                interpret):
    y, mean, rstd = _add_ln_fwd_impl(x, res, scale, bias, seed, eps,
                                     has_res, p_drop, br, interpret)
    return y, (x, res, scale, seed, mean, rstd)


def _add_ln_bwd(eps, has_res, p_drop, br, interpret, residuals, dy):
    x, res, scale, seed, mean, rstd = residuals
    N, H = x.shape
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    row = pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    with_dr = has_res and p_drop > 0.0
    if with_dr:
        def kern(seed_ref, dy_ref, x_ref, r_ref, mean_ref, rstd_ref,
                 sc_ref, dx_ref, dr_ref, dsc_ref, db_ref):
            _bwd_kernel(seed_ref, dy_ref, x_ref, r_ref, mean_ref,
                        rstd_ref, sc_ref, dx_ref, dsc_ref, db_ref,
                        has_res=has_res, p_drop=p_drop, dr_ref=dr_ref)
        out_specs = (row, row, vec, vec)
        out_shape = (jax.ShapeDtypeStruct((N, H), x.dtype),
                     jax.ShapeDtypeStruct((N, H), x.dtype),
                     jax.ShapeDtypeStruct((1, H), jnp.float32),
                     jax.ShapeDtypeStruct((1, H), jnp.float32))
    else:
        kern = functools.partial(_bwd_kernel, has_res=has_res,
                                 p_drop=p_drop)
        out_specs = (row, vec, vec)
        out_shape = (jax.ShapeDtypeStruct((N, H), x.dtype),
                     jax.ShapeDtypeStruct((1, H), jnp.float32),
                     jax.ShapeDtypeStruct((1, H), jnp.float32))
    outs = pl.pallas_call(
        kern,
        grid=(N // br,),
        in_specs=[seed_spec, row, row, row, stat, stat, vec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interp(interpret),
    )(seed, dy, x, res, mean, rstd, scale.reshape(1, H))
    if with_dr:
        dx, dres, dsc, db = outs
    else:
        dx, dsc, db = outs
        dres = dx if has_res else jnp.zeros_like(res)
    return (dx, dres, dsc.reshape(H).astype(scale.dtype),
            db.reshape(H).astype(scale.dtype), jnp.zeros_like(seed))


_add_ln.defvjp(_add_ln_fwd, _add_ln_bwd)


def ln_dropout_keep_bits(seed, n_blocks: int, br: int, H: int,
                         p_drop: float, interpret: bool = False):
    """Probe: the exact keep bits the fwd/bwd kernels draw per grid
    block → bool [n_blocks, br, H] (the oracle for hardware dropout
    validation, mirroring pallas_mhsa.dropout_keep_bits)."""
    def kern(seed_ref, o_ref):
        keep = _keep_bits((br, H), p_drop, seed_ref, pl.program_id(0))
        o_ref[:] = keep.astype(jnp.float32)[None]

    out = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, br, H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, br, H), jnp.float32),
        interpret=_interp(interpret),
    )(seed)
    return out > 0.5


def _jnp_reference(x, res, scale, bias, eps, p_drop=0.0,
                   dropout_rng=None):
    s = x.astype(jnp.float32)
    if res is not None:
        r = res.astype(jnp.float32)
        if p_drop > 0.0:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - p_drop,
                                        r.shape)
            r = jnp.where(keep, r / (1.0 - p_drop), 0.0)
        s = s + r
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(s * s, axis=-1, keepdims=True) - mean * mean
    xhat = (s - mean) * jax.lax.rsqrt(var + eps)
    y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def fused_add_ln(x: jnp.ndarray, res, scale: jnp.ndarray,
                 bias: jnp.ndarray, eps: float = 1e-12,
                 block_rows: int = 256, p_drop: float = 0.0,
                 dropout_rng=None, interpret: bool = False,
                 force_kernel: bool = False) -> jnp.ndarray:
    """``LayerNorm(x + dropout(res)) * scale + bias`` over rows of
    [N, H] (``res=None`` for a plain LN; ``p_drop=0`` for no dropout).
    Pallas on TPU — inverted dropout on the residual addend runs
    in-register from the hardware PRNG, folding the separate dropout
    pass (an extra [N, H] read+write per sublayer) into the LN's single
    pass; jnp elsewhere (bernoulli from ``dropout_rng``)."""
    N, H = x.shape
    use_kernel = force_kernel or jax.default_backend() in ("tpu", "axon")
    # res=None stays on the jnp path: a dummy operand would still be
    # DMA'd per block, wasting the bandwidth the kernel exists to save
    if not use_kernel or res is None or H % 128 or N % 8:
        return _jnp_reference(x, res, scale, bias, eps, p_drop,
                              dropout_rng)
    br = _pick_br(N, H, block_rows)
    if p_drop > 0.0:
        assert dropout_rng is not None
        seed = jax.lax.bitcast_convert_type(
            jax.random.bits(dropout_rng, (1,), jnp.uint32), jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return _add_ln(x, res, scale, bias, seed, float(eps), True,
                   float(p_drop), br, interpret)
