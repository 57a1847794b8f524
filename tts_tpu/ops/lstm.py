"""LSTM as a `lax.scan` — the structural win over the reference.

The reference unrolls every LSTM timestep into its GGML graph (node counts
110k/570k per call, kokoro/model.cpp:53-86,944,1147).  On TPU a scan compiles
once: the input projection for the whole sequence is one big MXU matmul, and
the recurrent part is a scan whose per-step cost is a single [H]x[H,4H]
matmul with weights resident on-chip.

Weight packing matches the GGUF layout (8 tensors per cell in gate order
i,f,g,o with ih at even indices, hh at odd — see kokoro_gguf_encoder.py's
prepare_lstm_tensor and kokoro/model.cpp:54-76).

`mask` support exists for padded-bucket execution: masked (padded) steps
pass the carry through unchanged, so a reverse-direction scan that enters
the sequence through padding arrives at the true end with the initial state,
exactly as an unpadded run would.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_lstm_params(tensors: dict, prefix: str, reverse: bool = False):
    """Pack 8 GGUF LSTM tensors into (W_ih [in,4H], W_hh [H,4H], b [4H]).

    GGUF names: {prefix}.weights.{0..7} / {prefix}.biases.{0..7}
    (reverse_weights/reverse_biases for the backward direction).
    Even index = input-hidden, odd = hidden-hidden; pairs ordered i,f,g,o.
    """
    wkey = "reverse_weights" if reverse else "weights"
    bkey = "reverse_biases" if reverse else "biases"
    w_ih = jnp.concatenate([tensors[f"{prefix}.{wkey}.{2 * g}"] for g in range(4)], axis=0)
    w_hh = jnp.concatenate([tensors[f"{prefix}.{wkey}.{2 * g + 1}"] for g in range(4)], axis=0)
    b = jnp.concatenate(
        [tensors[f"{prefix}.{bkey}.{2 * g}"] + tensors[f"{prefix}.{bkey}.{2 * g + 1}"]
         for g in range(4)], axis=0)
    return {"w_ih": w_ih.T, "w_hh": w_hh.T, "b": b}


def lstm(x, params, *, reverse: bool = False, mask=None):
    """Single-direction LSTM over [T, C_in] -> [T, H].

    params: {"w_ih": [C_in, 4H], "w_hh": [H, 4H], "b": [4H]}
    """
    w_ih, w_hh, b = params["w_ih"], params["w_hh"], params["b"]
    hidden = w_hh.shape[0]
    # whole-sequence input projection: one large MXU matmul
    xp = x @ w_ih + b                         # [T, 4H]
    if mask is not None:
        steps = (xp, mask)
    else:
        steps = (xp, jnp.ones(x.shape[0], dtype=x.dtype))

    def step(carry, inp):
        h, c = carry
        xt, m = inp
        gates = xt + h @ w_hh
        i, f, g, o = jnp.split(gates, 4)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = jnp.tanh(c_new) * o
        # padded steps pass the carry through untouched
        h_out = m * h_new + (1 - m) * h
        c_out = m * c_new + (1 - m) * c
        return (h_out, c_out), h_out

    init = (jnp.zeros(hidden, x.dtype), jnp.zeros(hidden, x.dtype))
    _, ys = jax.lax.scan(step, init, steps, reverse=reverse)
    return ys


def bilstm(x, fwd_params, bwd_params, *, mask=None):
    """Bidirectional LSTM: concat(fwd, bwd) along features, like
    kokoro/model.cpp:47-49."""
    f = lstm(x, fwd_params, mask=mask)
    bwd = lstm(x, bwd_params, reverse=True, mask=mask)
    return jnp.concatenate([f, bwd], axis=-1)
