"""Fused Pallas Adam leaf kernel (ops/pallas_adam.py) == the pinned jnp
formulation, values and in-place semantics; CPU runs the TPU-simulator
interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np

from news_recommendation_mind_tpu.ops.pallas_adam import (
    adam_leaf_eligible, adam_leaf_update,
)

B1, B2, EPS = 0.9, 0.999, 1e-8


def _reference(p, mu, nu, g, bc1, bc2, lr):
    mu2 = B1 * mu + (1.0 - B1) * g
    nu2 = B2 * nu + (1.0 - B2) * (g * g)
    mu_hat = mu2 / bc1
    nu_hat = nu2 / bc2
    upd = (mu_hat / (jnp.sqrt(nu_hat) + EPS)) * (-lr)
    return p + upd, mu2, nu2


def test_eligibility():
    f = jnp.zeros
    assert adam_leaf_eligible(f((768, 3072), jnp.float32))
    assert adam_leaf_eligible(f((3072,), jnp.float32))          # 1-row
    # embedding: rows not 8-divisible and too big for one block -> XLA
    # (which already streams it at full rate)
    assert not adam_leaf_eligible(f((30522, 768), jnp.float32))
    assert not adam_leaf_eligible(f((768, 100), jnp.float32))   # lanes
    assert not adam_leaf_eligible(f((3, 128), jnp.float32))     # tiny
    assert not adam_leaf_eligible(f((768, 768), jnp.bfloat16))  # dtype


def test_kernel_matches_reference_including_ragged_tail():
    rng = np.random.default_rng(0)
    # block_rows not dividing rows: BR halves until it divides
    for shape, br in (((1224, 256), 512), ((8, 128), 8), ((768,), 4)):
        p, mu, nu, g = (jnp.asarray(rng.standard_normal(shape),
                                    jnp.float32) for _ in range(4))
        nu = jnp.abs(nu)
        bc1, bc2, lr = 0.1, 0.001, 3e-3
        scalars = jnp.asarray([bc1, bc2, lr], jnp.float32)
        got = adam_leaf_update(p, mu, nu, g, scalars, b1=B1, b2=B2,
                               eps=EPS, block_rows=br, interpret=True)
        want = _reference(p, mu, nu, g, bc1, bc2, lr)
        for a, b, name in zip(got, want, ("p", "mu", "nu")):
            assert a.shape == shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7, err_msg=name)


def test_fused_apply_equals_update_path():
    """FusedAdam.fused_apply (jnp fallback on CPU) must equal
    update()+apply_updates exactly."""
    import optax

    from news_recommendation_mind_tpu.train.state import (
        make_fused_optimizer,
    )
    rng = np.random.default_rng(1)
    params = {"bert_x": jnp.asarray(rng.standard_normal((16, 128)),
                                    jnp.float32),
              "other": jnp.asarray(rng.standard_normal(40), jnp.float32)}
    opt = make_fused_optimizer(1e-2, 1e-4)
    s1 = opt.init(params)
    s2 = opt.init(params)
    pa = params
    pb = jax.tree_util.tree_map(jnp.array, params)
    for _ in range(3):
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.standard_normal(p.shape),
                                  jnp.float32), params)
        u, s1 = opt.update(g, s1, pa)
        pa = optax.apply_updates(pa, u)
        pb, s2 = opt.fused_apply(pb, s2, g)
        for a, b in zip(jax.tree_util.tree_leaves(pa),
                        jax.tree_util.tree_leaves(pb)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_block_rows_legal_for_every_eligible_shape():
    """Mosaic requires the row-block divisible by 8 OR equal to the full
    row count. A [310, 768] user-embedding leaf is eligible via the
    ≤2 MB whole-leaf rule, but halving 64 down landed on BR=2 — an
    unconditional TPU lowering error first hit by the round-4 serving
    benchmark. Every eligible R must now yield a legal block."""
    from news_recommendation_mind_tpu.ops.pallas_adam import (
        _pick_block_rows,
    )
    for R in (8, 16, 24, 48, 64, 128, 310, 307, 1000, 1024, 30522 // 2):
        C = 768
        if not (R % 8 == 0 or R * C * 4 <= (2 << 20)):
            continue
        br = _pick_block_rows(R)
        assert R % br == 0, (R, br)
        assert br % 8 == 0 or br == R, (R, br)

    # value parity at the exact failing shape (interpret mode)
    rng = np.random.default_rng(9)
    R, C = 310, 768
    p, mu, g = (jnp.asarray(rng.standard_normal((R, C)), jnp.float32)
                for _ in range(3))
    nu = jnp.asarray(np.abs(rng.standard_normal((R, C))), jnp.float32)
    scalars = jnp.asarray([0.9, 0.99, 1e-3], jnp.float32)
    got = adam_leaf_update(p, mu, nu, g, scalars, b1=0.9, b2=0.999,
                           eps=1e-8, interpret=True)
    want = _reference(p, mu, nu, g, 0.9, 0.99, 1e-3)
    for a, b, name in zip(got, want, ("p", "mu", "nu")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7, err_msg=name)
