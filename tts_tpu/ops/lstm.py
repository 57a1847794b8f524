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


def bilstm(x, fwd_params, bwd_params, *, mask=None, unroll: int = 1):
    """Bidirectional LSTM: concat(fwd, bwd) along features, like
    kokoro/model.cpp:47-49.

    Runs BOTH directions in ONE `lax.scan`: step t advances the forward
    state with input t and the backward state with input T-1-t (the
    backward outputs land reversed and are flipped after the scan).  The
    sequential chain is the latency floor of the whole LSTM — one scan of T
    steps with a stacked [2,H]x[H,4H] gate matmul halves the scan-step count
    vs two separate T-step scans for the same total MXU work."""
    T = x.shape[0]
    hidden = fwd_params["w_hh"].shape[0]
    xp_f = x @ fwd_params["w_ih"] + fwd_params["b"]       # [T, 4H]
    xp_b = (x @ bwd_params["w_ih"] + bwd_params["b"])[::-1]
    m = jnp.ones(T, x.dtype) if mask is None else mask.astype(x.dtype)
    w_hh = jnp.stack([fwd_params["w_hh"], bwd_params["w_hh"]])  # [2, H, 4H]

    def step(carry, inp):
        h, c = carry                                      # [2, H] each
        xt, mt = inp                                      # [2, 4H], [2]
        gates = xt + jnp.einsum("dh,dhk->dk", h, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jnp.tanh(c_new) * jax.nn.sigmoid(o)
        # padded steps pass the carry through untouched
        mt = mt[:, None]
        h_out = mt * h_new + (1 - mt) * h
        c_out = mt * c_new + (1 - mt) * c
        return (h_out, c_out), h_out

    init = (jnp.zeros((2, hidden), x.dtype), jnp.zeros((2, hidden), x.dtype))
    steps = (jnp.stack([xp_f, xp_b], axis=1), jnp.stack([m, m[::-1]], axis=1))
    # unroll trades compiled-code size for per-iteration loop overhead; the
    # math chain is unchanged (same ops, same order)
    _, ys = jax.lax.scan(step, init, steps, unroll=unroll)  # [T, 2, H]
    return jnp.concatenate([ys[:, 0], ys[::-1, 1]], axis=-1)
