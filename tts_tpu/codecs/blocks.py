"""Shared neural-audio-codec building blocks (DAC / SNAC).

Parity: /root/reference/src/decoder/general_neural_audio_codec.{h,cpp} —
residual units (snake -> dilated conv -> snake -> 1x1 conv + residual),
upsampling layers (snake -> transposed conv -> optional noise FiLM -> 3
residual units), and RVQ codebook decode.  All functions operate on
time-major [T, C] and are jittable."""

from __future__ import annotations

import jax.numpy as jnp

from tts_tpu.ops.basic import snake
from tts_tpu.ops.conv import conv1d, conv_transpose1d


def residual_unit(x, unit, *, padding: int, dilation: int, groups: int = 1):
    """snake -> conv(k7, dilated, maybe depthwise) -> snake -> conv1x1 + res
    (parity: general_neural_audio_codec.cpp:133-149)."""
    res = x
    cur = snake(x, unit["in_alpha"])
    cur = conv1d(cur, unit["in_w"], unit["in_b"], padding=padding,
                 dilation=dilation, groups=groups)
    cur = snake(cur, unit["out_alpha"])
    cur = conv1d(cur, unit["out_w"], unit["out_b"])
    return cur + res


def codec_layer(x, layer, *, stride: int, padding: int, groups: int = 1,
                noise=None):
    """snake -> conv_transpose upsample -> optional noise injection -> 3
    residual units with dilations 1/3/9 (parity: :151-164)."""
    cur = snake(x, layer["in_alpha"])
    cur = conv_transpose1d(cur, layer["in_w"], layer["in_b"], stride=stride,
                           padding=padding)
    if noise is not None and "noise_w" in layer:
        n = conv1d(cur, layer["noise_w"])
        cur = cur + n * noise
    for i, unit in enumerate(layer["units"]):
        cur = residual_unit(cur, unit, padding=3 ** (i + 1), dilation=3 ** i,
                            groups=groups)
    return cur


def quantizer_decode(codes, quantizers):
    """codes [T, H] int32 -> summed continuous latents [T, C].

    Each head: codebook lookup [T, D] -> 1x1 out-projection [T, C]
    (parity: :166-172 + dac_model.cpp:100-123)."""
    out = None
    for i, q in enumerate(quantizers):
        emb = q["codebook"][codes[:, i]]              # [T, D]
        proj = emb @ q["out_w"] + q["out_b"]          # [T, C]
        out = proj if out is None else out + proj
    return out
