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
    params = load_hf_bert_weights(params, hf.state_dict(), num_layers=L)

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
    params = load_hf_deberta_weights(params, hf.state_dict(), num_layers=L)

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
    params = load_hf_deberta_weights(params, hf.state_dict(), num_layers=L)

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
    loaded = load_hf_deberta_weights(params, hf.state_dict(), num_layers=L)

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
    loaded = load_hf_bert_weights(params, hf.state_dict(), num_layers=L)

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
