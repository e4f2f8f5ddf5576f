"""Fused residual+LayerNorm kernel (ops/pallas_ln.py): values and
gradients vs the jnp formulation and vs flax nn.LayerNorm. CPU runs the
TPU-simulator interpret mode."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from news_recommendation_mind_tpu.ops.pallas_ln import (
    _jnp_reference, fused_add_ln,
)

N, H, EPS = 24, 256, 1e-12


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(H) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32)
    return x, res, scale, bias


def kernel(x, res, scale, bias, br=8):
    return fused_add_ln(x, res, scale, bias, eps=EPS, block_rows=br,
                        interpret=True, force_kernel=True)


def test_values_match_jnp_and_flax():
    x, res, scale, bias = _inputs()
    got = np.asarray(kernel(x, res, scale, bias))
    want = np.asarray(_jnp_reference(x, res, scale, bias, EPS))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    ln = nn.LayerNorm(epsilon=EPS)
    flax_out = ln.apply(
        {"params": {"scale": scale, "bias": bias}}, x + res)
    np.testing.assert_allclose(got, np.asarray(flax_out),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match_jnp():
    x, res, scale, bias = _inputs(seed=1)
    ct = jnp.asarray(np.random.default_rng(2).standard_normal((N, H)),
                     jnp.float32)

    def f_k(x, res, scale, bias):
        return jnp.sum(kernel(x, res, scale, bias) * ct)

    def f_j(x, res, scale, bias):
        return jnp.sum(_jnp_reference(x, res, scale, bias, EPS) * ct)

    gk = jax.grad(f_k, argnums=(0, 1, 2, 3))(x, res, scale, bias)
    gj = jax.grad(f_j, argnums=(0, 1, 2, 3))(x, res, scale, bias)
    for a, b, name in zip(gk, gj, ("x", "res", "scale", "bias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_block_size_invariance():
    x, res, scale, bias = _inputs(seed=3)
    a = np.asarray(kernel(x, res, scale, bias, br=8))
    b = np.asarray(kernel(x, res, scale, bias, br=24))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_bf16_close():
    x, res, scale, bias = _inputs(seed=4)
    got = np.asarray(kernel(x.astype(jnp.bfloat16),
                            res.astype(jnp.bfloat16), scale, bias),
                     np.float32)
    want = np.asarray(_jnp_reference(x, res, scale, bias, EPS))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def drop_kernel(x, res, scale, bias, p, rng, br=8):
    return fused_add_ln(x, res, scale, bias, eps=EPS, block_rows=br,
                        p_drop=p, dropout_rng=rng, interpret=True,
                        force_kernel=True)


def test_dropout_matches_extracted_bits_oracle():
    """Fused dropout exactness: the kernel must equal the jnp LN applied
    to x + keep*res/(1-p) with the EXACT bits its PRNG draws (extracted
    via the mirrored probe kernel). On the CPU simulator the bit stream
    is a zero-stub (keep-all); scripts/validate_mhsa_tpu.py re-runs this
    oracle with live bits on hardware."""
    from news_recommendation_mind_tpu.ops.pallas_ln import (
        ln_dropout_keep_bits,
    )
    x, res, scale, bias = _inputs(seed=5)
    p, br = 0.3, 8
    rng = jax.random.PRNGKey(11)
    seed = jax.lax.bitcast_convert_type(
        jax.random.bits(rng, (1,), jnp.uint32), jnp.int32)
    keep = np.asarray(ln_dropout_keep_bits(seed, N // br, br, H, p,
                                           interpret=True))
    keep = keep.reshape(N, H)
    dropped = jnp.where(jnp.asarray(keep), res / (1.0 - p), 0.0)
    want = np.asarray(_jnp_reference(x, dropped, scale, bias, EPS))
    got = np.asarray(drop_kernel(x, res, scale, bias, p, rng, br=br))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dropout_fwd_bwd_mask_consistency():
    """The backward kernel must regenerate the forward's exact dropout
    bits. On the CPU simulator the bit stream is keep-all, making the
    p>0 forward exactly LN(x + res/(1-p)) — the kernel's value AND its
    x/res gradients (res exercises the keep-gated dres output the p>0
    path adds) must match jax.grad of that closed form to float32
    precision. scripts/validate_mhsa_tpu.py re-checks with live bits."""
    from news_recommendation_mind_tpu.ops.pallas_ln import _jnp_reference
    x, res, scale, bias = _inputs(seed=6)
    rng = jax.random.PRNGKey(13)
    p = 0.25
    ct = jnp.asarray(np.random.default_rng(7).standard_normal((N, H)),
                     jnp.float32)

    def f_k(xx, rr):
        return jnp.sum(drop_kernel(xx, rr, scale, bias, p, rng) * ct)

    def f_oracle(xx, rr):
        return jnp.sum(_jnp_reference(xx, rr / (1.0 - p), scale, bias,
                                      EPS) * ct)

    gk = jax.grad(f_k, argnums=(0, 1))(x, res)
    go = jax.grad(f_oracle, argnums=(0, 1))(x, res)
    for a, b, name in zip(gk, go, ("x", "res")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_dropout_zero_p_identical_to_plain():
    x, res, scale, bias = _inputs(seed=7)
    a = np.asarray(kernel(x, res, scale, bias))
    b = np.asarray(drop_kernel(x, res, scale, bias, 0.0, None))
    np.testing.assert_array_equal(a, b)
