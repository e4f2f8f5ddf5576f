"""RNN scan kernels vs torch CPU reference semantics."""
import numpy as np
import pytest

import jax.numpy as jnp

from news_recommendation_mind_tpu.ops import gru_scan, lstm_scan

torch = pytest.importorskip("torch")


def _torch_lstm_params(lstm):
    return {
        "w_ih": jnp.asarray(lstm.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(lstm.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(lstm.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(lstm.bias_hh_l0.detach().numpy()),
    }


def test_lstm_matches_torch():
    torch.manual_seed(0)
    B, T, D, H = 3, 7, 5, 4
    lstm = torch.nn.LSTM(D, H, batch_first=True)
    x = torch.randn(B, T, D)
    with torch.no_grad():
        out_t, (h_t, c_t) = lstm(x)
    out_j, h_j, c_j = lstm_scan(_torch_lstm_params(lstm), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t[0].numpy(), atol=1e-5)


def test_lstm_masked_equals_pack_padded():
    """Mask-frozen state == pack_padded_sequence final hidden state
    (the reference's variable-length handling, models/Encoders/RNN.py:64-70)."""
    torch.manual_seed(1)
    B, T, D, H = 4, 6, 5, 3
    lens = [6, 3, 1, 5]
    lstm = torch.nn.LSTM(D, H, batch_first=True)
    x = torch.randn(B, T, D)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, lens, batch_first=True, enforce_sorted=False)
    with torch.no_grad():
        _, (h_t, _) = lstm(packed)
    mask = np.zeros((B, T), np.float32)
    for i, l in enumerate(lens):
        mask[i, :l] = 1
    _, h_j, _ = lstm_scan(_torch_lstm_params(lstm), jnp.asarray(x.numpy()),
                          mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(h_j), h_t[0].numpy(), atol=1e-5)


def test_lstm_reverse_matches_torch_bidirectional():
    torch.manual_seed(2)
    B, T, D, H = 2, 5, 4, 3
    lstm = torch.nn.LSTM(D, H, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, D)
    with torch.no_grad():
        out_t, (h_t, _) = lstm(x)
    fwd_p = {
        "w_ih": jnp.asarray(lstm.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(lstm.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(lstm.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(lstm.bias_hh_l0.detach().numpy()),
    }
    bwd_p = {
        "w_ih": jnp.asarray(lstm.weight_ih_l0_reverse.detach().numpy().T),
        "w_hh": jnp.asarray(lstm.weight_hh_l0_reverse.detach().numpy().T),
        "b_ih": jnp.asarray(lstm.bias_ih_l0_reverse.detach().numpy()),
        "b_hh": jnp.asarray(lstm.bias_hh_l0_reverse.detach().numpy()),
    }
    xj = jnp.asarray(x.numpy())
    out_f, h_f, _ = lstm_scan(fwd_p, xj)
    out_b, h_b, _ = lstm_scan(bwd_p, xj, reverse=True)
    np.testing.assert_allclose(np.asarray(out_f), out_t[..., :H].numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b), out_t[..., H:].numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_f), h_t[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_b), h_t[1].numpy(), atol=1e-5)


def test_gru_matches_torch():
    torch.manual_seed(3)
    B, T, D, H = 3, 7, 5, 4
    gru = torch.nn.GRU(D, H, batch_first=True)
    x = torch.randn(B, T, D)
    with torch.no_grad():
        out_t, h_t = gru(x)
    params = {
        "w_ih": jnp.asarray(gru.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(gru.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(gru.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(gru.bias_hh_l0.detach().numpy()),
    }
    out_j, h_j = gru_scan(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t[0].numpy(), atol=1e-5)


def test_lstm_initial_state():
    torch.manual_seed(4)
    B, T, D, H = 2, 4, 3, 3
    lstm = torch.nn.LSTM(D, H, batch_first=True)
    x = torch.randn(B, T, D)
    h0 = torch.randn(1, B, H)
    c0 = torch.randn(1, B, H)
    with torch.no_grad():
        _, (h_t, _) = lstm(x, (h0, c0))
    _, h_j, _ = lstm_scan(_torch_lstm_params(lstm), jnp.asarray(x.numpy()),
                          h0=jnp.asarray(h0[0].numpy()),
                          c0=jnp.asarray(c0[0].numpy()))
    np.testing.assert_allclose(np.asarray(h_j), h_t[0].numpy(), atol=1e-5)
