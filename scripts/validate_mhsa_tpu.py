"""Hardware validation for the fused short-MHSA kernel (ops/pallas_mhsa).

The CPU TPU-simulator cannot exercise the dropout bit stream (its
prng_random_bits is a zero-stub), so the dropout-dependent checks run
here on the real chip:

  1. deterministic value + gradient parity vs the dense XLA formulation
  2. dropout output == dense oracle built from the probe kernel's
     extracted keep bits (exact per-(cell, head) seeding match)
  3. fwd/bwd dropout-bit consistency via finite differences
  4. seed variation: different dropout rngs → different outputs
  5. keep-rate ≈ 1-p

Run: python scripts/validate_mhsa_tpu.py   (needs the TPU)
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# the XLA reference's f32 einsums otherwise run at TPU default matmul
# precision (bf16 passes) and sit ~1e-3 off the kernel's true-f32
# accumulation; highest precision makes the tight comparison meaningful
jax.config.update("jax_default_matmul_precision", "highest")

from news_recommendation_mind_tpu.ops.pallas_mhsa import (  # noqa: E402
    _xla_reference, dropout_keep_bits, mhsa_plan, short_mhsa,
)

U, S, H, NH = 12, 30, 128, 4
# the oracle must use the same pack size the kernel actually ran with
P, _G = mhsa_plan(S, H, NH, 3)
P_DROP = 0.3


def main():
    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((U, S, H)), jnp.float32)
               for _ in range(3))
    mask = np.ones((U, S), np.float32)
    mask[1, -5:] = 0.0
    mask = jnp.asarray(mask)

    def kern(qq, kk, vv, p_drop=0.0, key=None):
        return short_mhsa(qq, kk, vv, mask, NH, p_drop=p_drop,
                          dropout_rng=key, articles_per_block=P)

    # 1. deterministic parity
    got = np.asarray(kern(q, k, v))
    want = np.asarray(_xla_reference(q, k, v, mask, NH, 0.0, None))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    ct = jnp.asarray(rng.standard_normal((U, S, H)), jnp.float32)
    gk = jax.grad(lambda a, b, c: jnp.sum(kern(a, b, c) * ct),
                  argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(lambda a, b, c: jnp.sum(
        _xla_reference(a, b, c, mask, NH, 0.0, None) * ct),
        argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(gk, gd, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)
    print("1. deterministic value+grad parity ok")

    # 2. dropout vs extracted-bits oracle
    key = jax.random.PRNGKey(11)
    got = np.asarray(kern(q, k, v, p_drop=P_DROP, key=key))
    seed = jax.lax.bitcast_convert_type(
        jax.random.bits(key, (1,), jnp.uint32), jnp.int32)
    R = P * S
    keep = np.asarray(dropout_keep_bits(seed, U // P, NH, R, P_DROP))
    rate = keep.mean()
    assert abs(rate - (1 - P_DROP)) < 0.02, rate
    hd = H // NH
    want = np.zeros((U, S, H), np.float32)
    qn, kn, vn, mn = (np.asarray(t) for t in (q, k, v, mask))
    for c in range(U // P):
        arts = range(c * P, (c + 1) * P)
        for h in range(NH):
            sl = slice(h * hd, (h + 1) * hd)
            qf = np.concatenate([qn[a, :, sl] for a in arts])
            kf = np.concatenate([kn[a, :, sl] for a in arts])
            vf = np.concatenate([vn[a, :, sl] for a in arts])
            mf = np.concatenate([mn[a] for a in arts]) > 0
            s = qf @ kf.T / np.sqrt(hd)
            blk = ((np.arange(R)[:, None] // S)
                   == (np.arange(R)[None] // S)) & mf[None, :]
            s = np.where(blk, s, -1e9)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            p = np.where(blk, p, 0.0)
            p = np.where(keep[c, h], p / (1 - P_DROP), 0.0)
            of = p @ vf
            for j, a in enumerate(arts):
                want[a, :, sl] = of[j * S:(j + 1) * S]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    print(f"2. dropout == extracted-bits oracle ok (keep rate {rate:.4f})")

    # 3. fwd/bwd bit consistency (finite differences)
    def f(qq):
        return jnp.sum(kern(qq, k, v, p_drop=P_DROP, key=key) * ct)
    g = jax.grad(f)(q)
    d = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)
    eps = 1e-3
    fd = (f(q + eps * d) - f(q - eps * d)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.sum(g * d)), float(fd), rtol=5e-3)
    print("3. dropout fwd/bwd bit consistency ok")

    # 4. seed variation
    o1 = np.asarray(kern(q, k, v, p_drop=P_DROP, key=jax.random.PRNGKey(1)))
    o2 = np.asarray(kern(q, k, v, p_drop=P_DROP, key=jax.random.PRNGKey(2)))
    assert not np.allclose(o1, o2)
    print("4. seed variation ok")

    # 5. fused dropout+residual+LN (ops/pallas_ln): live-bit validation
    from news_recommendation_mind_tpu.ops.pallas_ln import (
        _jnp_reference, _pick_br, fused_add_ln, ln_dropout_keep_bits,
    )
    NL, HL, EPS = 512, 256, 1e-12
    x = jnp.asarray(rng.standard_normal((NL, HL)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((NL, HL)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(HL) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(HL) * 0.1, jnp.float32)
    key = jax.random.PRNGKey(21)
    br = _pick_br(NL, HL, 256)
    seed = jax.lax.bitcast_convert_type(
        jax.random.bits(key, (1,), jnp.uint32), jnp.int32)
    keep = np.asarray(ln_dropout_keep_bits(seed, NL // br, br, HL,
                                           P_DROP)).reshape(NL, HL)
    rate = keep.mean()
    assert abs(rate - (1 - P_DROP)) < 0.02, rate
    dropped = jnp.where(jnp.asarray(keep), res / (1 - P_DROP), 0.0)
    got = np.asarray(fused_add_ln(x, res, scale, bias, eps=EPS,
                                  p_drop=P_DROP, dropout_rng=key))
    want = np.asarray(_jnp_reference(x, dropped, scale, bias, EPS))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    ctl = jnp.asarray(rng.standard_normal((NL, HL)), jnp.float32)
    gk = jax.grad(lambda a, b: jnp.sum(fused_add_ln(
        a, b, scale, bias, eps=EPS, p_drop=P_DROP, dropout_rng=key)
        * ctl), argnums=(0, 1))(x, res)
    go = jax.grad(lambda a, b: jnp.sum(_jnp_reference(
        a, jnp.where(jnp.asarray(keep), b / (1 - P_DROP), 0.0),
        scale, bias, EPS) * ctl), argnums=(0, 1))(x, res)
    for a, b, n in zip(gk, go, ("x", "res")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)
    print(f"5. fused LN dropout oracle + grads ok (keep rate {rate:.4f})")
    print("ALL MHSA HARDWARE CHECKS PASSED")


if __name__ == "__main__":
    main()
