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
    """
    # NCH layout: measured faster end-to-end on v5e than NWC here — XLA fuses
    # the surrounding elementwise chains far better in this layout (an NWC
    # variant cut the transpose copies but made loop fusions ~5x slower/op)
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
    if groups != 1:
        xs = jnp.split(x, groups, axis=1)
        ws = jnp.split(w, groups, axis=0)
        outs = [conv_transpose1d(xi, wi, stride=stride, padding=padding,
                                 output_padding=output_padding, dilation=dilation)
                for xi, wi in zip(xs, ws)]
        out = jnp.concatenate(outs, axis=1)
        return out + b if b is not None else out

    k = w.shape[-1]
    # transposed conv == lhs-dilated conv with flipped kernel
    lhs = x.T[None]                      # [1, C_in, T]
    eff_k = dilation * (k - 1) + 1
    pad_lo = eff_k - 1 - padding
    pad_hi = eff_k - 1 - padding + output_padding
    out = lax.conv_general_dilated(
        lhs,
        jnp.flip(w, -1).transpose(1, 0, 2).astype(x.dtype),   # -> [C_out, C_in, K]
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
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
