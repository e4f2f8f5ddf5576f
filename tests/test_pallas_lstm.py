"""Fused Pallas LSTM vs the scan reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from news_recommendation_mind_tpu.ops.pallas_lstm import lstm_fused
from news_recommendation_mind_tpu.ops.rnn import lstm_scan


def _params(rng, D, H):
    return {
        "w_ih": jnp.asarray(rng.normal(size=(D, 4 * H)) * 0.2, jnp.float32),
        "w_hh": jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.2, jnp.float32),
        "b_ih": jnp.asarray(rng.normal(size=(4 * H,)) * 0.1, jnp.float32),
        "b_hh": jnp.asarray(rng.normal(size=(4 * H,)) * 0.1, jnp.float32),
    }


@pytest.mark.parametrize("B,T,D,H,mask_mode", [
    (4, 6, 5, 8, "full"),
    (8, 5, 8, 16, "ragged"),
    (5, 7, 4, 8, "ragged"),   # B not divisible by block → padding path
])
def test_fused_matches_scan_forward(B, T, D, H, mask_mode):
    rng = np.random.default_rng(0)
    p = _params(rng, D, H)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    if mask_mode == "ragged":
        lens = rng.integers(1, T + 1, B)
        mask = jnp.asarray((np.arange(T)[None] < lens[:, None])
                           .astype(np.float32))
    else:
        mask = None
    out_s, h_s, c_s = lstm_scan(p, x, mask=mask)
    out_f, h_f, c_f = lstm_fused(p, x, mask=mask, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_s), atol=1e-5)


def test_fused_matches_scan_gradients():
    rng = np.random.default_rng(1)
    B, T, D, H = 4, 5, 6, 8
    p = _params(rng, D, H)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lens = rng.integers(1, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None])
                       .astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)

    def loss_scan(p, x):
        out, h, c = lstm_scan(p, x, mask=mask)
        return jnp.sum((h - tgt) ** 2) + 0.1 * jnp.sum(out ** 2) \
            + 0.05 * jnp.sum(c ** 2)

    def loss_fused(p, x):
        out, h, c = lstm_fused(p, x, mask=mask, block_b=4, interpret=True)
        return jnp.sum((h - tgt) ** 2) + 0.1 * jnp.sum(out ** 2) \
            + 0.05 * jnp.sum(c ** 2)

    v_s, (gp_s, gx_s) = jax.value_and_grad(loss_scan, argnums=(0, 1))(p, x)
    v_f, (gp_f, gx_f) = jax.value_and_grad(loss_fused, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(float(v_f), float(v_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_s),
                               atol=1e-4)
    for k in p:
        np.testing.assert_allclose(np.asarray(gp_f[k]), np.asarray(gp_s[k]),
                                   atol=1e-4, err_msg=k)


def test_fused_initial_state_grads():
    rng = np.random.default_rng(2)
    B, T, D, H = 4, 4, 3, 8
    p = _params(rng, D, H)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)

    def run(fn):
        def loss(h0, c0):
            out, h, c = fn(p, x, h0=h0, c0=c0)
            return jnp.sum(h ** 2) + jnp.sum(out ** 2)
        return jax.grad(loss, argnums=(0, 1))(h0, c0)

    gh_s, gc_s = run(lambda p, x, h0, c0: lstm_scan(p, x, h0=h0, c0=c0))
    gh_f, gc_f = run(lambda p, x, h0, c0: lstm_fused(
        p, x, h0=h0, c0=c0, block_b=4, interpret=True))
    np.testing.assert_allclose(np.asarray(gh_f), np.asarray(gh_s), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_s), atol=1e-4)
