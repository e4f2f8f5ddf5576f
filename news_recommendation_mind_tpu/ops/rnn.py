"""Recurrent cells as `lax.scan` over time with one-shot input projection.

TPU-native replacement for cuDNN LSTM/GRU (reference models/Encoders/
RNN.py:12, 43-45, 80). The key layout decision: the input-to-hidden
projection for *all* timesteps is a single large [B*T, D]x[D, 4H] matmul
(MXU-friendly, done outside the scan); the scan body only carries the
small recurrent [B, H]x[H, 4H] matmul. Variable-length sequences use
mask-based state freezing instead of pack_padded_sequence: once a row's
mask goes to 0, its carried state stops updating, so the final carry equals
the state at each row's last valid step — exactly what
`pack_padded_sequence` + final hidden state computes (reference
models/Encoders/RNN.py:64-70).

Gate math matches torch.nn.LSTM/GRU (i,f,g,o ordering; GRU's r,z,n with the
separate b_hn bias inside the reset gate) so weights are unit-testable
against torch CPU.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def lstm_scan(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None,
              h0: Optional[jnp.ndarray] = None,
              c0: Optional[jnp.ndarray] = None,
              reverse: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray,
                                              jnp.ndarray]:
    """LSTM over time.

    Args:
      params: {w_ih [D,4H], w_hh [H,4H], b_ih [4H], b_hh [4H]} with gate
        blocks ordered (input, forget, cell, output) like torch.
      x:    [B, T, D] inputs.
      mask: [B, T] 1.0 for valid steps (None = all valid).
      h0/c0: [B, H] initial state (default zeros).
      reverse: process the sequence right-to-left.

    Returns: (outputs [B, T, H], h_T [B, H], c_T [B, H]).
    """
    B, T, _ = x.shape
    H = params["w_hh"].shape[0]
    dtype = x.dtype
    # one big MXU matmul for all timesteps
    xg = x.reshape(B * T, -1) @ params["w_ih"] + params["b_ih"] + params["b_hh"]
    xg = xg.reshape(B, T, 4 * H)
    if h0 is None:
        h0 = jnp.zeros((B, H), dtype)
    if c0 is None:
        c0 = jnp.zeros((B, H), dtype)
    if mask is None:
        mask = jnp.ones((B, T), dtype)

    w_hh = params["w_hh"]

    def step(carry, inp):
        h, c = carry
        gates_x, m = inp
        gates = gates_x + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m[:, None]
        h = m * h_new + (1 - m) * h
        c = m * c_new + (1 - m) * c
        return (h, c), h

    xs = (jnp.swapaxes(xg, 0, 1), jnp.swapaxes(mask.astype(dtype), 0, 1))
    (h_t, c_t), outs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return jnp.swapaxes(outs, 0, 1), h_t, c_t


def gru_scan(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None,
             h0: Optional[jnp.ndarray] = None,
             reverse: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GRU over time (torch gate ordering r,z,n and dual-bias semantics).

    params: {w_ih [D,3H], w_hh [H,3H], b_ih [3H], b_hh [3H]}.
    Returns: (outputs [B, T, H], h_T [B, H]).
    """
    B, T, _ = x.shape
    H = params["w_hh"].shape[0]
    dtype = x.dtype
    xg = x.reshape(B * T, -1) @ params["w_ih"] + params["b_ih"]
    xg = xg.reshape(B, T, 3 * H)
    if h0 is None:
        h0 = jnp.zeros((B, H), dtype)
    if mask is None:
        mask = jnp.ones((B, T), dtype)

    w_hh, b_hh = params["w_hh"], params["b_hh"]

    def step(h, inp):
        gates_x, m = inp
        hg = h @ w_hh + b_hh
        xr, xz, xn = jnp.split(gates_x, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1 - z) * n + z * h
        m = m[:, None]
        h = m * h_new + (1 - m) * h
        return h, h

    xs = (jnp.swapaxes(xg, 0, 1), jnp.swapaxes(mask.astype(dtype), 0, 1))
    h_t, outs = jax.lax.scan(step, h0, xs, reverse=reverse)
    return jnp.swapaxes(outs, 0, 1), h_t
