"""From-scratch JAX BERT == HuggingFace torch BertModel, numerically.

Builds a *randomly initialised* transformers.BertModel locally (no
download), maps its state_dict through models/bert.py
load_hf_bert_weights, and compares hidden states and pooled outputs on
the same inputs. This pins the weight-mapping (transposes, layer paths)
and the encoder math (post-LN residuals, GELU FFN, tanh pooler) to the
reference's substrate (reference models/PLM.py:21-84 delegates to HF
AutoModel).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402

from news_recommendation_mind_tpu.models.bert import (  # noqa: E402
    BertModel, bert_variant, load_hf_bert_weights,
)

V, HID, L, HEADS, INTER, S, B = 97, 32, 2, 4, 64, 12, 3


def test_bert_matches_transformers():
    hf_cfg = transformers.BertConfig(
        vocab_size=V, hidden_size=HID, num_hidden_layers=L,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg).eval()

    variant = bert_variant("bert", vocab_size=V).replace(
        hidden_size=HID, num_layers=L, num_heads=HEADS,
        intermediate_size=INTER, max_position=40,
        hidden_dropout=0.0, attention_dropout=0.0)
    model = BertModel(variant)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, V, (B, S)).astype(np.int32)
    attn = np.ones((B, S), np.float32)
    attn[0, -3:] = 0.0  # one padded row

    params = model.init(jax.random.PRNGKey(0), tokens, attn,
                        deterministic=True)
    params, _ = load_hf_bert_weights(params, hf.state_dict(), num_layers=L)

    hidden, pooled = model.apply(params, tokens, attn, deterministic=True)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(tokens.astype(np.int64)),
                 attention_mask=torch.tensor(attn))
    np.testing.assert_allclose(np.asarray(hidden, np.float32),
                               out.last_hidden_state.numpy(),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled, np.float32),
                               out.pooler_output.numpy(),
                               atol=2e-4, rtol=2e-4)


def test_deberta_matches_transformers():
    """Disentangled attention (c2p+p2c, shared rel table, fused in_proj
    with q/v-only biases, both-sides masking, masked input embeddings)
    against a randomly initialised transformers.DebertaModel configured
    like microsoft/deberta-base (relative_attention, no absolute position
    embeddings, type_vocab_size=0)."""
    hf_cfg = transformers.DebertaConfig(
        vocab_size=V, hidden_size=HID, num_hidden_layers=L,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=40, type_vocab_size=0,
        relative_attention=True, pos_att_type=["c2p", "p2c"],
        position_biased_input=False, max_relative_positions=-1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.DebertaModel(hf_cfg).eval()

    from news_recommendation_mind_tpu.models.bert import (
        load_hf_deberta_weights,
    )
    variant = bert_variant("deberta", vocab_size=V).replace(
        hidden_size=HID, num_layers=L, num_heads=HEADS,
        intermediate_size=INTER, max_position=40,
        hidden_dropout=0.0, attention_dropout=0.0)
    model = BertModel(variant)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, V, (B, S)).astype(np.int32)
    attn = np.ones((B, S), np.float32)
    attn[0, -3:] = 0.0  # one padded row

    params = model.init(jax.random.PRNGKey(0), tokens, attn,
                        deterministic=True)
    params, _ = load_hf_deberta_weights(params, hf.state_dict(), num_layers=L)

    hidden, _ = model.apply(params, tokens, attn, deterministic=True)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(tokens.astype(np.int64)),
                 attention_mask=torch.tensor(attn))
    ours = np.asarray(hidden, np.float32)
    theirs = out.last_hidden_state.numpy()
    # padded query rows differ by construction (HF: uniform attention
    # over -inf-filled rows; ours: zero probs) — compare valid positions
    valid = attn > 0
    np.testing.assert_allclose(ours[valid], theirs[valid],
                               atol=2e-4, rtol=2e-4)


def test_deberta_gradients_match_transformers():
    """Backward parity: d(mean of valid hidden states)/d(word embeddings)
    must match torch autograd through the disentangled attention."""
    hf_cfg = transformers.DebertaConfig(
        vocab_size=V, hidden_size=HID, num_hidden_layers=L,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=40, type_vocab_size=0,
        relative_attention=True, pos_att_type=["c2p", "p2c"],
        position_biased_input=False, max_relative_positions=-1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(2)
    hf = transformers.DebertaModel(hf_cfg).eval()

    from news_recommendation_mind_tpu.models.bert import (
        load_hf_deberta_weights,
    )
    variant = bert_variant("deberta", vocab_size=V).replace(
        hidden_size=HID, num_layers=L, num_heads=HEADS,
        intermediate_size=INTER, max_position=40,
        hidden_dropout=0.0, attention_dropout=0.0)
    model = BertModel(variant)

    rng = np.random.default_rng(3)
    tokens = rng.integers(0, V, (B, S)).astype(np.int32)
    attn = np.ones((B, S), np.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, attn,
                        deterministic=True)
    params, _ = load_hf_deberta_weights(params, hf.state_dict(), num_layers=L)

    def loss_fn(p):
        hidden, _ = model.apply(p, tokens, attn, deterministic=True)
        return hidden.mean()

    grads = jax.grad(loss_fn)(params)
    g_emb = np.asarray(
        grads["params"]["word_embeddings"]["embedding"], np.float32)

    emb = hf.embeddings.word_embeddings
    out = hf(input_ids=torch.tensor(tokens.astype(np.int64)),
             attention_mask=torch.tensor(attn))
    out.last_hidden_state.mean().backward()
    g_ref = emb.weight.grad.numpy()
    np.testing.assert_allclose(g_emb, g_ref, atol=2e-5, rtol=2e-4)


def test_deberta_loader_maps_every_weight():
    """Every DebertaModel tensor must land in our param tree (possibly
    transposed) — guards the in_proj interleaving assumption."""
    hf_cfg = transformers.DebertaConfig(
        vocab_size=V, hidden_size=HID, num_hidden_layers=L,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=40, type_vocab_size=0,
        relative_attention=True, pos_att_type=["c2p", "p2c"],
        position_biased_input=False, max_relative_positions=-1)
    torch.manual_seed(1)
    hf = transformers.DebertaModel(hf_cfg).eval()

    from news_recommendation_mind_tpu.models.bert import (
        load_hf_deberta_weights,
    )
    variant = bert_variant("deberta", vocab_size=V).replace(
        hidden_size=HID, num_layers=L, num_heads=HEADS,
        intermediate_size=INTER, max_position=40)
    model = BertModel(variant)
    tokens = np.zeros((1, S), np.int32)
    attn = np.ones((1, S), np.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, attn,
                        deterministic=True)
    loaded, _ = load_hf_deberta_weights(params, hf.state_dict(), num_layers=L)

    sd = {k: v.numpy() for k, v in hf.state_dict().items()
          if "position_ids" not in k}
    leaves = [np.asarray(leaf) for _, leaf in
              jax.tree_util.tree_flatten_with_path(loaded)[0]]
    for k, v in sd.items():
        found = any(
            v.shape == l.shape and np.allclose(v, l, atol=1e-6) or
            v.T.shape == l.shape and np.allclose(v.T, l, atol=1e-6)
            for l in leaves)
        assert found, f"HF tensor {k} not mapped into deberta params"


def test_loader_maps_every_encoder_weight():
    """Every encoder/embedding/pooler tensor in the HF state_dict must land
    somewhere (guards against silent strict=False misses)."""
    hf_cfg = transformers.BertConfig(
        vocab_size=V, hidden_size=HID, num_hidden_layers=L,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=40, type_vocab_size=2)
    torch.manual_seed(1)
    hf = transformers.BertModel(hf_cfg).eval()
    variant = bert_variant("bert", vocab_size=V).replace(
        hidden_size=HID, num_layers=L, num_heads=HEADS,
        intermediate_size=INTER, max_position=40)
    model = BertModel(variant)
    tokens = np.zeros((1, S), np.int32)
    attn = np.ones((1, S), np.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, attn,
                        deterministic=True)
    loaded, _ = load_hf_bert_weights(params, hf.state_dict(), num_layers=L)

    sd = {k: v.numpy() for k, v in hf.state_dict().items()
          if "position_ids" not in k}
    leaves = {tuple(str(p) for p in path): np.asarray(leaf)
              for path, leaf in
              jax.tree_util.tree_flatten_with_path(loaded)[0]}
    # no need to map paths again: check every HF tensor's VALUES appear
    # among the loaded leaves (possibly transposed)
    for k, v in sd.items():
        found = any(
            v.shape == l.shape and np.allclose(v, l, atol=1e-6) or
            v.T.shape == l.shape and np.allclose(v.T, l, atol=1e-6)
            for l in leaves.values())
        assert found, f"HF tensor {k} not mapped into BertModel params"


def test_distilbert_matches_transformers():
    """distill variant == transformers.DistilBertModel numerically: the
    renamed post-LN stack (q/k/v/out_lin, sa_layer_norm, ffn.lin1/lin2,
    output_layer_norm) maps through load_hf_distilbert_weights
    (reference models/PLM.py:49-57 loads distilbert via AutoModel)."""
    hf_cfg = transformers.DistilBertConfig(
        vocab_size=V, dim=HID, n_layers=L, n_heads=HEADS,
        hidden_dim=INTER, max_position_embeddings=40,
        dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(0)
    hf = transformers.DistilBertModel(hf_cfg).eval()

    from news_recommendation_mind_tpu.models.bert import (
        load_hf_distilbert_weights,
    )
    variant = bert_variant("distill", vocab_size=V).replace(
        hidden_size=HID, num_layers=L, num_heads=HEADS,
        intermediate_size=INTER, max_position=40,
        hidden_dropout=0.0, attention_dropout=0.0)
    model = BertModel(variant)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, V, (B, S)).astype(np.int32)
    attn = np.ones((B, S), np.float32)
    attn[0, -3:] = 0.0

    params = model.init(jax.random.PRNGKey(0), tokens, attn,
                        deterministic=True)
    params, _ = load_hf_distilbert_weights(params, hf.state_dict(),
                                        num_layers=L)
    hidden, _ = model.apply(params, tokens, attn, deterministic=True)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(tokens.astype(np.int64)),
                 attention_mask=torch.tensor(attn))
    np.testing.assert_allclose(np.asarray(hidden, np.float32),
                               out.last_hidden_state.numpy(),
                               atol=2e-4, rtol=2e-4)


def test_distilbert_loader_maps_every_weight():
    hf_cfg = transformers.DistilBertConfig(
        vocab_size=V, dim=HID, n_layers=L, n_heads=HEADS,
        hidden_dim=INTER, max_position_embeddings=40)
    torch.manual_seed(1)
    hf = transformers.DistilBertModel(hf_cfg).eval()
    from news_recommendation_mind_tpu.models.bert import (
        load_hf_distilbert_weights,
    )
    variant = bert_variant("distill", vocab_size=V).replace(
        hidden_size=HID, num_layers=L, num_heads=HEADS,
        intermediate_size=INTER, max_position=40)
    model = BertModel(variant)
    tokens = np.zeros((1, S), np.int32)
    attn = np.ones((1, S), np.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, attn,
                        deterministic=True)
    loaded, _ = load_hf_distilbert_weights(params, hf.state_dict(),
                                        num_layers=L)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()
          if "position_ids" not in k}
    leaves = [np.asarray(leaf) for _, leaf in
              jax.tree_util.tree_flatten_with_path(loaded)[0]]
    for k, v in sd.items():
        found = any(
            v.shape == l.shape and np.allclose(v, l, atol=1e-6) or
            v.T.shape == l.shape and np.allclose(v.T, l, atol=1e-6)
            for l in leaves)
        assert found, f"HF tensor {k} not mapped into distill params"


def _longformer_pair(seed, window_one_sided, s_len):
    """(HF LongformerModel with global projections tied to local, matching
    our BertModel + loaded params). Tying is sound: at conversion time HF
    longformer checkpoints initialise *_global from the local projections
    (reference models/PLM.py:66-78 relies on the same checkpoints)."""
    from news_recommendation_mind_tpu.models.bert import (
        load_hf_longformer_weights,
    )
    hf_cfg = transformers.LongformerConfig(
        vocab_size=V, hidden_size=HID, num_hidden_layers=L,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=s_len + 2, type_vocab_size=1,
        attention_window=2 * window_one_sided, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(seed)
    hf = transformers.LongformerModel(hf_cfg).eval()
    with torch.no_grad():
        for layer in hf.encoder.layer:
            a = layer.attention.self
            a.query_global.weight.copy_(a.query.weight)
            a.query_global.bias.copy_(a.query.bias)
            a.key_global.weight.copy_(a.key.weight)
            a.key_global.bias.copy_(a.key.bias)
            a.value_global.weight.copy_(a.value.weight)
            a.value_global.bias.copy_(a.value.bias)

    variant = bert_variant("longformer", vocab_size=V).replace(
        hidden_size=HID, num_layers=L, num_heads=HEADS,
        intermediate_size=INTER, max_position=s_len,
        window=window_one_sided,
        hidden_dropout=0.0, attention_dropout=0.0)
    model = BertModel(variant)
    tokens = np.zeros((1, s_len), np.int32)
    attn = np.ones((1, s_len), np.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, attn,
                        deterministic=True)
    params, _ = load_hf_longformer_weights(params, hf.state_dict(),
                                        num_layers=L)
    return hf, model, params


def test_longformer_matches_transformers():
    """local+global banded attention == transformers.LongformerModel on
    the sliding-window + first-token-global pattern: HF position rows
    shift by 2 (RoBERTa lineage), global projections tied to local, and
    every token's output (including the global CLS) must agree on valid
    positions."""
    S_LONG, W1 = 96, 16
    hf, model, params = _longformer_pair(0, W1, S_LONG)

    rng = np.random.default_rng(0)
    tokens = rng.integers(2, V, (B, S_LONG)).astype(np.int32)
    attn = np.ones((B, S_LONG), np.float32)
    tokens[0, -37:] = 1  # trailing pads must be pad_token_id=1 (HF
    attn[0, -37:] = 0.0  # derives position ids from input_ids != pad)

    hidden, _ = model.apply(params, tokens, attn, deterministic=True)

    glob = np.zeros((B, S_LONG), np.int64)
    glob[:, 0] = 1
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(tokens.astype(np.int64)),
                 attention_mask=torch.tensor(attn.astype(np.int64)),
                 global_attention_mask=torch.tensor(glob))
    ours = np.asarray(hidden, np.float32)
    theirs = out.last_hidden_state.numpy()
    valid = attn > 0
    np.testing.assert_allclose(ours[valid], theirs[valid],
                               atol=3e-4, rtol=3e-4)


def test_longformer_loader_maps_every_local_weight():
    """Every non-``*_global`` Longformer tensor must land in our params
    (the global projections are intentionally unmapped — they are local
    copies at conversion time; see load_hf_longformer_weights)."""
    S_LONG, W1 = 64, 16
    hf, model, params = _longformer_pair(1, W1, S_LONG)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()
          if "position_ids" not in k and "_global" not in k
          and "position_embeddings" not in k}
    leaves = [np.asarray(leaf) for _, leaf in
              jax.tree_util.tree_flatten_with_path(params)[0]]
    for k, v in sd.items():
        found = any(
            v.shape == l.shape and np.allclose(v, l, atol=1e-6) or
            v.T.shape == l.shape and np.allclose(v.T, l, atol=1e-6)
            for l in leaves)
        assert found, f"HF tensor {k} not mapped into longformer params"
    # the position table maps with the +2 RoBERTa shift
    pos = hf.state_dict()["embeddings.position_embeddings.weight"].numpy()
    ours = np.asarray(params["params"]["position_embeddings"])
    np.testing.assert_allclose(ours, pos[2:2 + ours.shape[0]], atol=1e-6)


def test_maybe_load_hf_weights_end_to_end(tmp_path):
    """A pytorch_model.bin dropped under {data_root}/hf/{variant}/ must
    initialise the PLM's bert tower at Trainer-init time via
    experiment.maybe_load_hf_weights (file-based stand-in for the
    reference's AutoModel.from_pretrained, models/PLM.py:49-57)."""
    hf_cfg = transformers.DistilBertConfig(
        vocab_size=V, dim=HID, n_layers=L, n_heads=HEADS,
        hidden_dim=4 * HID, max_position_embeddings=512)
    torch.manual_seed(3)
    hf = transformers.DistilBertModel(hf_cfg).eval()
    ckpt_dir = tmp_path / "hf" / "distill"
    ckpt_dir.mkdir(parents=True)
    torch.save(hf.state_dict(), ckpt_dir / "pytorch_model.bin")

    from news_recommendation_mind_tpu.config import Config
    from news_recommendation_mind_tpu.experiment import (
        build_model, maybe_load_hf_weights,
    )
    cfg = Config(model="plm", bert="distill", bert_dim=HID, head_num=HEADS,
                 bert_layers=L, data_root=str(tmp_path))
    model = build_model(cfg, vocab_size=V, user_num=7)
    batch = {
        "cdd_token": np.zeros((2, 2, 8), np.int32),
        "cdd_attn": np.ones((2, 2, 8), np.float32),
        "his_token": np.zeros((2, 3, 8), np.int32),
        "his_attn": np.ones((2, 3, 8), np.float32),
        "his_mask": np.ones((2, 3), np.float32),
        "cdd_mask": np.ones((2, 2), np.float32),
        "label": np.zeros(2, np.int32),
        "user_id": np.zeros(2, np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    loaded, ok = maybe_load_hf_weights(cfg, params)
    assert ok
    got = np.asarray(
        loaded["params"]["bert"]["word_embeddings"]["embedding"])
    want = hf.state_dict()["embeddings.word_embeddings.weight"].numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    # intermediate-size mismatch guard: the loader must have mapped a
    # layer kernel too (transposed)
    k = np.asarray(loaded["params"]["bert"]["layer_0"]["ffn_in"]["kernel"])
    np.testing.assert_allclose(
        k, hf.state_dict()["transformer.layer.0.ffn.lin1.weight"].numpy().T,
        atol=1e-6)
    # the loaded tree must still apply cleanly (shape-guarded puts)
    scores = model.apply(loaded, batch, deterministic=True)
    assert np.all(np.isfinite(np.asarray(scores, np.float32)))


def test_width_mismatched_checkpoint_places_zero_tensors():
    """A checkpoint with a different hidden width must place 0 tensors
    (strict=False shape guard) and report that count, so callers can
    refuse to claim pretrained init (advisor round-2 low)."""
    hf_cfg = transformers.BertConfig(
        vocab_size=V, hidden_size=HID * 2, num_hidden_layers=L,
        num_attention_heads=HEADS, intermediate_size=INTER * 2,
        max_position_embeddings=40, type_vocab_size=2)
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg).eval()

    variant = bert_variant("bert", vocab_size=V).replace(
        hidden_size=HID, num_layers=L, num_heads=HEADS,
        intermediate_size=INTER, max_position=40)
    model = BertModel(variant)
    tokens = np.zeros((1, S), np.int32)
    attn = np.ones((1, S), np.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, attn,
                        deterministic=True)
    _, placed = load_hf_bert_weights(params, hf.state_dict(), num_layers=L)
    assert placed == 0


def test_longformer_width_mismatch_skips_hand_rolled_copies():
    """The longformer loader's shifted position/token-type copies must
    skip (not crash) on a width-mismatched checkpoint, matching put()'s
    strict=False semantics (advisor round-2 low)."""
    from news_recommendation_mind_tpu.models.bert import (
        load_hf_longformer_weights,
    )
    hf_cfg = transformers.LongformerConfig(
        vocab_size=V, hidden_size=HID * 2, num_hidden_layers=L,
        num_attention_heads=HEADS, intermediate_size=INTER * 2,
        max_position_embeddings=64, type_vocab_size=1,
        attention_window=[8] * L, pad_token_id=1)
    torch.manual_seed(0)
    hf = transformers.LongformerModel(hf_cfg).eval()

    variant = bert_variant("longformer", vocab_size=V).replace(
        hidden_size=HID, num_layers=L, num_heads=HEADS,
        intermediate_size=INTER, max_position=40, window=4)
    model = BertModel(variant)
    tokens = np.zeros((1, S), np.int32)
    attn = np.ones((1, S), np.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, attn,
                        deterministic=True)
    _, placed = load_hf_longformer_weights(params, hf.state_dict(),
                                           num_layers=L)
    assert placed == 0


def test_funnel_structural_import_places_content_weights():
    """Structural funnel init (reference models/PLM.py:30-35 loads
    funnel-transformer/small-base): per-block q/k/v, post_proj, norms,
    FFN and embeddings must land exactly (verified tensor-by-tensor);
    relative/segment attention terms (r_*, seg_embed) have no slot and
    are skipped — see load_hf_funnel_weights for the per-weight ledger."""
    from news_recommendation_mind_tpu.models.bert import (
        load_hf_funnel_weights,
    )
    D_MODEL, N_HEAD, D_INNER, LAYERS, BLOCKS = 16, 2, 32, 6, 3
    hf_cfg = transformers.FunnelConfig(
        vocab_size=V, block_sizes=[2, 2, 2], num_decoder_layers=0,
        d_model=D_MODEL, n_head=N_HEAD, d_head=D_MODEL // N_HEAD,
        d_inner=D_INNER, max_position_embeddings=64)
    torch.manual_seed(0)
    hf = transformers.FunnelBaseModel(hf_cfg).eval()

    from news_recommendation_mind_tpu.models.bert import (
        BertModel, bert_variant,
    )
    variant = bert_variant("funnel", vocab_size=V).replace(
        hidden_size=D_MODEL, num_heads=N_HEAD, intermediate_size=D_INNER,
        num_layers=LAYERS, pool_blocks=BLOCKS, max_position=64)
    model = BertModel(variant)
    tokens = np.zeros((1, S), np.int32)
    attn = np.ones((1, S), np.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, attn,
                        deterministic=True)
    loaded, placed = load_hf_funnel_weights(params, hf.state_dict(),
                                            num_layers=LAYERS,
                                            pool_blocks=BLOCKS)
    # 3 embeddings + 6 layers x (3 qkv kernels + 2 kv biases + post_proj
    # w/b + 2 norms x w/b + ffn 2x w/b) = 3 + 6*15 = 93
    assert placed == 3 + LAYERS * 15, placed

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    q_kernel = np.asarray(
        loaded["params"]["layer_3"]["attention"]["query"]["kernel"])
    np.testing.assert_array_equal(
        q_kernel, sd["encoder.blocks.1.1.attention.q_head.weight"].T)
    # q_head has no bias in HF; ours must stay at its zero init
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["layer_3"]["attention"]["query"]
                   ["bias"]), 0.0)
    # the loaded encoder must still run (structural init, not parity)
    hidden, pooled = model.apply(loaded, tokens, attn, deterministic=True)
    assert np.isfinite(np.asarray(pooled)).all()


def test_reformer_structural_import_places_weights():
    """Structural reformer init (the reference's PLM else-branch loads
    google/reformer-crime-and-punishment, models/PLM.py:80-84 +
    utils/Manager.py:926): tied-q/k LSH projections, local-layer q/k/v,
    attention output, FFN, norms and the axial position halves must land
    exactly; the 2H reversible output norm has no slot — see
    load_hf_reformer_weights for the per-weight ledger."""
    from news_recommendation_mind_tpu.models.bert import (
        load_hf_reformer_weights,
    )
    HID_R, AHEAD, NHEAD, FFN_R, LAYERS = 64, 16, 2, 96, 4
    hf_cfg = transformers.ReformerConfig(
        vocab_size=V, hidden_size=HID_R, attention_head_size=AHEAD,
        num_attention_heads=NHEAD, feed_forward_size=FFN_R,
        attn_layers=["local", "lsh", "local", "lsh"],
        axial_pos_embds=True,
        # larger s0 grid than ours: the import must SLICE (the real
        # checkpoint factors 524288 positions as (512, 1024))
        axial_pos_shape=[16, 8], axial_pos_embds_dim=[16, 48],
        max_position_embeddings=128, num_buckets=4,
        local_attn_chunk_length=8, lsh_attn_chunk_length=8,
        is_decoder=False)
    torch.manual_seed(0)
    hf = transformers.ReformerModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    variant = bert_variant("reformer", vocab_size=V).replace(
        hidden_size=HID_R, num_heads=NHEAD, attention_head_size=AHEAD,
        intermediate_size=FFN_R, num_layers=LAYERS, chunk_size=8,
        num_buckets=4, max_position=64, axial_pos_shape=(8, 8),
        axial_pos_dims=(16, 48))
    model = BertModel(variant)
    tokens = np.zeros((1, S), np.int32)
    attn = np.ones((1, S), np.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, attn,
                        deterministic=True)
    loaded, placed = load_hf_reformer_weights(params, hf.state_dict(),
                                              num_layers=LAYERS)
    # word + 2 axial halves + 2 local layers x 12 + 2 lsh layers x 11
    assert placed == 3 + 2 * 12 + 2 * 11, placed

    p = loaded["params"]
    # tied q/k lands in the shared projection, transposed
    np.testing.assert_array_equal(
        np.asarray(p["layer_1"]["attention"]["query_key"]["kernel"]),
        sd["encoder.layers.1.attention.self_attention.query_key.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(p["layer_0"]["attention"]["query"]["kernel"]),
        sd["encoder.layers.0.attention.self_attention.query.weight"].T)
    # HF reformer projections carry no biases; ours stay at zero init
    np.testing.assert_array_equal(
        np.asarray(p["layer_0"]["attention"]["value"]["bias"]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(p["layer_2"]["attn_out"]["bias"]), 0.0)
    # axial halves: sliced on the factored axis, same layout
    np.testing.assert_array_equal(
        np.asarray(p["axial_pos_0"]),
        sd["embeddings.position_embeddings.weights.0"][:8])
    np.testing.assert_array_equal(
        np.asarray(p["axial_pos_1"]),
        sd["embeddings.position_embeddings.weights.1"][:, :8])
    # the loaded encoder must still run (structural init, not parity:
    # pre-LN params sit in post-LN slots, reversible 2H norm unmapped)
    hidden, pooled = model.apply(loaded, tokens, attn, deterministic=True)
    assert np.isfinite(np.asarray(pooled)).all()


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["longformer", "bigbird", "reformer"])
def test_imported_weights_still_learn(variant, tmp_path):
    """Learning smoke for the import subtleties (round-2 VERDICT weak 6):
    longformer deliberately skips HF's *_global q/k/v and bigbird uses a
    seeded static random-block pattern — a PLM initialised through those
    loaders must still LEARN (loss falls under fine-tuning on the
    synthetic corpus), proving the unmapped/reinterpreted pieces leave
    the gradient path intact."""
    from news_recommendation_mind_tpu.config import Config
    from news_recommendation_mind_tpu.experiment import (
        build_data, build_model, build_train_loader, maybe_load_hf_weights,
    )
    from news_recommendation_mind_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )
    HIDB, LB, HEADB = 32, 2, 4
    cfg = Config(scale="synthetic", model="plm", bert=variant,
                 bert_dim=HIDB, bert_layers=LB, head_num=HEADB,
                 data_root=str(tmp_path / "data"),
                 cache_root=str(tmp_path / "cache"),
                 batch_size=16, his_size=6, signal_length=12,
                 hidden_dim=HIDB, lr=1e-3, bert_lr=1e-3,
                 dtype="float32", device_gather=False)
    data = build_data(cfg)

    torch.manual_seed(0)
    if variant == "longformer":
        hf_cfg = transformers.LongformerConfig(
            vocab_size=data.vocab_size, hidden_size=HIDB,
            num_hidden_layers=LB, num_attention_heads=HEADB,
            intermediate_size=4 * HIDB, max_position_embeddings=1028,
            type_vocab_size=1, attention_window=[8] * LB, pad_token_id=1)
        hf = transformers.LongformerModel(hf_cfg).eval()
    elif variant == "reformer":
        # dims mirror build_model's bert_dim override: hidden=HIDB,
        # ffn=4*HIDB, heads=HEADB, head size hidden//heads
        hf_cfg = transformers.ReformerConfig(
            vocab_size=data.vocab_size, hidden_size=HIDB,
            attention_head_size=HIDB // HEADB,
            num_attention_heads=HEADB, feed_forward_size=4 * HIDB,
            attn_layers=["local", "lsh"][:LB] * (LB // 2 or 1),
            axial_pos_embds=True, axial_pos_shape=[40, 32],
            axial_pos_embds_dim=[HIDB // 4, HIDB - HIDB // 4],
            max_position_embeddings=1280, num_buckets=32,
            local_attn_chunk_length=64, lsh_attn_chunk_length=64,
            is_decoder=False)
        hf = transformers.ReformerModel(hf_cfg).eval()
    else:
        hf_cfg = transformers.BigBirdConfig(
            vocab_size=data.vocab_size, hidden_size=HIDB,
            num_hidden_layers=LB, num_attention_heads=HEADB,
            intermediate_size=4 * HIDB, max_position_embeddings=1024,
            block_size=4)
        hf = transformers.BigBirdModel(hf_cfg).eval()
    ckpt_dir = tmp_path / "data" / "hf" / variant
    ckpt_dir.mkdir(parents=True)
    torch.save(hf.state_dict(), ckpt_dir / "pytorch_model.bin")

    model = build_model(cfg, data.vocab_size, data.user_num)
    loader = build_train_loader(cfg, data)
    batch = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), batch)
    params, ok = maybe_load_hf_weights(cfg, params)
    assert ok, "import must place tensors"

    opt = make_optimizer(cfg.lr, cfg.bert_lr)
    state = create_train_state(params, opt)
    step = make_train_step(model, opt, donate=False)
    rng = jax.random.PRNGKey(1)
    # overfit one fixed batch: from ln(5) ≈ 1.609, 60 Adam steps must
    # memorize it — a flat loss here would mean the import left part of
    # the network detached from the gradient path. The reformer path
    # (LSH sort/bucket plumbing) converges more slowly — measured 1.275
    # @60 → 0.195 @100 — so it gets a longer budget
    n_steps = 120 if variant == "reformer" else 60
    losses = []
    for _ in range(n_steps):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[0] > 1.0 and losses[-1] < 0.5, (losses[0], losses[-1])
