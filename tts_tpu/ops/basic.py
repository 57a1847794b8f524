"""Elementwise / normalization primitives.

These replace the reference's patched-GGML graph ops (snake_1d, ggml_norm
used as LayerNorm/InstanceNorm, AdaIN application — /root/reference/src/
util.cpp:96-101, src/models/kokoro/model.cpp:88-165).  All functions are pure,
jittable, and shaped [T, C] (time-major) unless noted; XLA fuses them into
surrounding matmuls/convs so no Pallas is needed here.

Masking: padded-bucket execution keeps tails exactly zero so that 'same'
convolutions see the identical neighborhood a dynamically-shaped run would
(see models/kokoro.py for the bucketing contract).
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x, eps: float = 1e-5, axis: int = -1):
    """Normalize along `axis` (no learned params — scale/shift applied by
    callers, matching ggml_norm usage)."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def ada_layer_norm(x, gamma, beta, eps: float = 1e-5):
    """AdaLayerNorm: LayerNorm over channels per timestep, then
    y = xn * (1 + gamma) + beta with style-conditioned gamma/beta [C].
    Parity: kokoro/model.cpp:1020-1027."""
    xn = layer_norm(x, eps=eps, axis=-1)
    return xn * (1.0 + gamma) + beta


def instance_norm_time(x, eps: float = 1e-5, mask=None):
    """InstanceNorm1d: normalize over the time axis per channel on [T, C].

    `mask` is [T] (1=valid) for padded-bucket execution; statistics are
    computed over valid frames only so bucketing matches exact shapes.
    """
    x32 = x.astype(jnp.float32)          # stats in f32 regardless of policy
    if mask is None:
        mean = jnp.mean(x32, axis=0, keepdims=True)
        var = jnp.var(x32, axis=0, keepdims=True)
    else:
        m = mask.astype(jnp.float32)[:, None]
        n = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(x32 * m, axis=0, keepdims=True) / n
        var = jnp.sum(jnp.square(x32 - mean) * m, axis=0, keepdims=True) / n
    out = ((x32 - mean) / jnp.sqrt(var + eps)).astype(x.dtype)
    if mask is not None:
        out = out * mask.astype(x.dtype)[:, None]
    return out


def ada_instance_norm(x, gamma, beta, eps: float = 1e-5, mask=None):
    """AdaIN: instance norm over time + style-conditioned affine [C].
    Parity: kokoro/model.cpp:93-100 (norm + x*gamma + x + beta pattern)."""
    xn = instance_norm_time(x, eps=eps, mask=mask)
    out = xn * (1.0 + gamma).astype(x.dtype) + beta.astype(x.dtype)
    if mask is not None:
        out = out * mask.astype(x.dtype)[:, None]
    return out


def snake(x, alpha):
    """Snake activation x + sin^2(alpha*x)/alpha (arXiv 2006.08195).
    Parity: src/util.cpp:96-101.  alpha is per-channel [C], x is [T, C]."""
    a = alpha.astype(x.dtype)
    return x + jnp.square(jnp.sin(x * a)) / a


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, x * negative_slope)
