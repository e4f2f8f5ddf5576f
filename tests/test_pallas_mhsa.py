"""Fused short-sequence MHSA kernel (ops/pallas_mhsa.py) vs the dense
XLA formulation: values, gradients, masking, dropout semantics. CPU runs
the kernel in interpret mode (conftest pins JAX_PLATFORMS=cpu)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_mind_tpu.ops.pallas_mhsa import (
    _xla_reference, mhsa_plan, short_mhsa,
)

U, S, H, NH = 9, 13, 32, 4        # deliberately not multiples of P


def _inputs(seed=0, full_mask=False):
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.standard_normal((U, S, H)), jnp.float32)
               for _ in range(3))
    if full_mask:
        mask = np.ones((U, S), np.float32)
    else:
        mask = (rng.random((U, S)) > 0.25).astype(np.float32)
        mask[:, 0] = 1.0
        mask[3] = 0.0            # one fully-masked article
    return q, k, v, jnp.asarray(mask)


def kernel(q, k, v, mask, p_drop=0.0, rng=None, P=8):
    return short_mhsa(q, k, v, mask, NH, p_drop=p_drop, dropout_rng=rng,
                      articles_per_block=P, interpret=True,
                      force_kernel=True)


def test_plan():
    # S=13 forces sublane-multiple article packs of 8; H=32 ≤ 128 puts
    # all 4 heads in one lane group
    assert mhsa_plan(S, H, NH, 4) == (8, 4)
    assert mhsa_plan(30, 768, 12, 16) == (16, 2)      # newsbert shape
    assert mhsa_plan(30, 768, 12, 13) == (16, 2)      # rounds up
    assert mhsa_plan(30, 768, 7, 4) is None           # 768/7 not integral


def test_values_match_dense():
    q, k, v, mask = _inputs()
    got = kernel(q, k, v, mask)
    want = _xla_reference(q, k, v, mask, NH, 0.0, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # fully-masked article → all-zero output (masked_softmax semantics)
    assert np.abs(np.asarray(got)[3]).max() == 0.0


def test_gradients_match_dense():
    q, k, v, mask = _inputs(seed=1)
    ct = jnp.asarray(np.random.default_rng(2).standard_normal((U, S, H)),
                     jnp.float32)

    def f_kernel(q, k, v):
        return jnp.sum(kernel(q, k, v, mask) * ct)

    def f_dense(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, mask, NH, 0.0, None) * ct)

    g_k = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g_d = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_k, g_d, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_padding_path_matches():
    """U=9 pads to 16 (P=8) or 24 (P=24); the pad must not leak."""
    q, k, v, mask = _inputs(seed=3)
    got = kernel(q, k, v, mask, P=8)
    got2 = kernel(q, k, v, mask, P=24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(got2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="the CPU TPU-simulator's prng_random_bits is a "
                           "zero-stub (verified empirically); dropout bits "
                           "only exist on real TPU. Run via "
                           "scripts/validate_mhsa_tpu.py on hardware.")
def test_dropout_matches_extracted_bits_oracle():
    """The dropout path must equal dense attention with the EXACT keep
    bits the kernel's PRNG draws (extracted via the probe kernel that
    mirrors the per-(cell, head) seeding). Runs on hardware via
    scripts/validate_mhsa_tpu.py, which implements the oracle."""
    import subprocess
    import sys
    subprocess.run([sys.executable, "scripts/validate_mhsa_tpu.py"],
                   check=True)


def test_dropout_fwd_bwd_mask_consistency():
    """The backward kernel must regenerate the forward's exact dropout
    bits: custom-VJP directional derivative == finite difference of the
    (fixed-seed, deterministic) forward. (On the CPU simulator the bit
    stream is degenerate but the p>0 gradient chain — 1/(1-p) scaling,
    keep-conditional dP — is still exercised; scripts/validate_mhsa_tpu.py
    re-runs this with live bits on hardware.)"""
    q, k, v, mask = _inputs(seed=5, full_mask=True)
    rng = jax.random.PRNGKey(7)
    ct = jnp.asarray(np.random.default_rng(6).standard_normal((U, S, H)),
                     jnp.float32)

    def f(qq):
        return jnp.sum(kernel(qq, k, v, mask, p_drop=0.3, rng=rng) * ct)

    g = jax.grad(f)(q)
    d = jnp.asarray(np.random.default_rng(8).standard_normal(q.shape),
                    jnp.float32)
    eps = 1e-3
    fd = (f(q + eps * d) - f(q - eps * d)) / (2 * eps)
    analytic = jnp.sum(g * d)
    np.testing.assert_allclose(float(analytic), float(fd), rtol=2e-3)


def test_bf16_values_close():
    q, k, v, mask = _inputs(seed=9)
    got = np.asarray(kernel(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                            v.astype(jnp.bfloat16), mask), np.float32)
    want = np.asarray(_xla_reference(q, k, v, mask, NH, 0.0, None))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
