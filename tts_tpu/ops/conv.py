"""1-D convolutions on time-major [T, C] sequences.

Replaces ggml_conv_1d / ggml_conv_1d_dw / the patched ggml_conv_transpose_1d
(SURVEY.md §2.7).  Weights keep the torch/GGUF layout [out_ch, in_ch/groups, k]
so GGUF tensors load without reshuffling; XLA lowers these onto the MXU as
implicit matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv1d(x, w, b=None, *, stride: int = 1, padding: int = 0, dilation: int = 1,
           groups: int = 1):
    """x: [T, C_in], w: [C_out, C_in/groups, K] -> [T_out, C_out].

    Same semantics as torch Conv1d / ggml_conv_1d: symmetric zero padding.

    Ungrouped convs lower as K shifted [T,C]@[C,C] matmuls accumulated in
    f32 — the pure MXU form.  Measured (tools/kokoro_conv_ab.py, v5e, shape
    [23040,128] k7): lax-conv NCH 95 us/op, NWC 78 us, shifted-matmul 3-36 us
    — the XLA conv lowering never reaches the MXU bound at TTS channel
    counts, while static shifted slices of one padded buffer fuse into the
    matmul operand loads.  f32 accumulation across taps is also *more*
    accurate than the bf16-out conv it replaces.
    """
    if groups == 1:
        k = w.shape[-1]
        T = x.shape[0]
        span = dilation * (k - 1)
        T_out = (T + 2 * padding - span - 1) // stride + 1
        need = (T_out - 1) * stride + span + 1          # padded length consumed
        xp = jnp.pad(x, ((padding, max(0, need - T - padding)), (0, 0)))
        wt = w.transpose(2, 1, 0).astype(x.dtype)       # [K, C_in, C_out]
        lim = (T_out - 1) * stride + 1
        acc = None
        for j in range(k):
            s0 = j * dilation
            sl = lax.slice(xp, (s0, 0), (s0 + lim, x.shape[1]), (stride, 1))
            term = lax.dot(sl, wt[j], preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
        if b is not None:
            acc = acc + b.astype(jnp.float32)
        return acc.astype(x.dtype)
    # grouped/depthwise: one XLA conv (a per-group Python split would emit
    # `groups` separate convs into the graph)
    lhs = x.T[None]                      # [1, C_in, T]
    out = lax.conv_general_dilated(
        lhs, w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,  # MXU still accumulates f32 internally
    )
    out = out[0].T                       # [T_out, C_out]
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def conv_transpose1d(x, w, b=None, *, stride: int = 1, padding: int = 0,
                     output_padding: int = 0, dilation: int = 1, groups: int = 1):
    """Transposed conv matching torch ConvTranspose1d (and the reference's
    patched ggml_conv_transpose_1d, used for codec upsampling).

    x: [T, C_in], w: [C_in, C_out/groups, K] (torch layout) -> [T_out, C_out]
    T_out = (T-1)*stride - 2*padding + dilation*(K-1) + 1 + output_padding
    """
    k = w.shape[-1]
    # transposed conv == lhs-dilated conv with flipped kernel.  Grouped case
    # (incl. depthwise, groups == C) stays ONE XLA conv via
    # feature_group_count — a per-group Python split would emit C separate
    # convs into the graph (measured: the depthwise pool in kokoro's AdaIN
    # blocks alone added ~512 ops per block).
    # torch layout [C_in, C_out/g, K] -> forward-conv layout [C_out, C_in/g, K]
    c_in = w.shape[0]
    wf = jnp.flip(w, -1)
    if groups == 1:
        wf = wf.transpose(1, 0, 2)
    else:
        wf = wf.reshape(groups, c_in // groups, w.shape[1], k)
        wf = wf.transpose(0, 2, 1, 3).reshape(groups * w.shape[1],
                                              c_in // groups, k)
    lhs = x.T[None]                      # [1, C_in, T]
    eff_k = dilation * (k - 1) + 1
    pad_lo = eff_k - 1 - padding
    pad_hi = eff_k - 1 - padding + output_padding
    out = lax.conv_general_dilated(
        lhs,
        wf.astype(x.dtype),
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    out = out[0].T
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def reflect_pad_front(x, n: int = 1):
    """Front reflect padding used by the Kokoro generator after the last
    upsample (kokoro/model.cpp:213-217 concatenates column 1 in front)."""
    return jnp.concatenate([x[1 : n + 1][::-1], x], axis=0)
