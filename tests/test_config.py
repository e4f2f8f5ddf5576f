from news_recommendation_mind_tpu.config import (
    Config, config_from_object, parse_config,
)


def test_defaults_match_reference():
    # reference utils/Manager.py:44-106 defaults
    c = Config()
    assert c.cdd_size == 5
    assert c.his_size == 50
    assert c.signal_length == 30
    assert c.impr_size == 2000
    assert c.hidden_dim == 150
    assert c.bert_dim == 768
    assert c.lr == 1e-4 and c.bert_lr == 6e-6
    assert c.seed == 42
    assert c.metric_list == ["auc", "mean_mrr", "ndcg@5;10"]


def test_derived_names():
    assert Config().name == "twotower__cnn__lstm"
    assert Config(model="plm", bert="bert", encoderU="attn").name == \
        "plm__bert__attn"
    assert Config(model="xformer", bert="longformer").name == \
        "xformer__longformer"


def test_cli_overrides():
    c = parse_config(["-s", "small", "-m", "dev", "-bs", "64",
                      "--encoderN", "mha", "--no-fast"])
    assert c.scale == "small" and c.mode == "dev"
    assert c.batch_size == 64
    assert c.encoderN == "mha"
    assert c.fast is False


def test_config_from_object():
    class Obj:
        def __init__(self):
            self.scale = "large"
            self.hidden_dim = 256
            self.unrelated = "x"
    c = config_from_object(Obj())
    assert c.scale == "large" and c.hidden_dim == 256


def test_paths():
    c = Config(mode="dev")
    assert c.news_repr_path().endswith(
        "tensors/twotower__cnn__lstm/demo/dev/news.npy")
    assert c.result_dir(7).endswith("twotower__cnn__lstm/demo_step7")


def test_rng_impl_selection():
    """auto → threefry on CPU backends; explicit values pass through; the
    jitted dropout path runs under each impl."""
    import jax
    import jax.numpy as jnp

    from news_recommendation_mind_tpu.config import Config, apply_rng_impl

    apply_rng_impl(Config(rng_impl="auto"))
    assert jax.config.jax_default_prng_impl == (
        "rbg" if jax.default_backend() == "tpu" else "threefry2x32")
    try:
        apply_rng_impl(Config(rng_impl="rbg"))
        assert jax.config.jax_default_prng_impl == "rbg"
        key = jax.random.PRNGKey(0)
        drop = jax.jit(lambda k, x: jax.random.bernoulli(k, 0.5, x.shape))
        mask = drop(key, jnp.ones((8, 8)))
        assert mask.shape == (8, 8)
    finally:
        apply_rng_impl(Config(rng_impl="threefry"))
        assert jax.config.jax_default_prng_impl == "threefry2x32"


def test_flag_spelling_forms():
    """Every flag answers to dashed AND underscored spellings, including
    bool --no- negations (the reference's flags are underscored,
    utils/Manager.py:44-101; our canonical form is dashed)."""
    from news_recommendation_mind_tpu.config import parse_config

    c = parse_config(["--no-device-gather", "--signal_length", "12",
                      "--his-size", "7"])
    assert c.device_gather is False
    assert c.signal_length == 12 and c.his_size == 7
    c2 = parse_config(["--device_gather", "--no-fused_embedding"])
    assert c2.device_gather is True and c2.fused_embedding is False


def test_apply_compile_cache_sets_jax_config(tmp_path, monkeypatch):
    import jax

    from news_recommendation_mind_tpu.config import (
        Config, apply_compile_cache,
    )
    # restore afterwards: leaving the cache dir pointing at a deleted
    # pytest tmp_path would make later slow compiles in this session try
    # to write into a vanished directory (advisor round-2 low)
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        import os

        # an explicit JAX_COMPILATION_CACHE_DIR env override wins: the
        # config-derived path must NOT be installed (the suite-wide
        # shared cache set by tests/conftest.py relies on this)
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/env/wins")
        before = jax.config.jax_compilation_cache_dir
        apply_compile_cache(Config(cache_root=str(tmp_path / "e")))
        assert jax.config.jax_compilation_cache_dir == before

        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
        cfg = Config(cache_root=str(tmp_path / "c"))
        apply_compile_cache(cfg)
        assert jax.config.jax_compilation_cache_dir == str(
            tmp_path / "c" / "jax_compile")
        assert os.path.isdir(jax.config.jax_compilation_cache_dir)
        # opt-out leaves the previous setting untouched
        before = jax.config.jax_compilation_cache_dir
        apply_compile_cache(Config(cache_root=str(tmp_path / "d"),
                                   compile_cache=False))
        assert jax.config.jax_compilation_cache_dir == before
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
