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

import math

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


def instance_norm_time(x, eps: float = 1e-5, mask=None, zero_tail: bool = False):
    """InstanceNorm1d: normalize over the time axis per channel on [T, C].

    `mask` is [T] (1=valid) for padded-bucket execution; statistics are
    computed over valid frames only so bucketing matches exact shapes.

    `zero_tail=True` asserts the caller-maintained invariant that x is
    EXACTLY zero outside the mask (the bucketing contract): then
    sum(x*m) == sum(x) and sum(x^2*m) == sum(x^2), so the stats need no
    [T, C] mask materialization and no second (x-mean) pass — the masked
    variant measured 0.046 ms vs 0.020 unmasked per [23040,128] call
    (tools/kokoro_mrf_bisect.py)."""
    x32 = x.astype(jnp.float32)          # stats in f32 regardless of policy
    if mask is None:
        mean = jnp.mean(x32, axis=0, keepdims=True)
        var = jnp.var(x32, axis=0, keepdims=True)
    elif zero_tail:
        n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        mean = jnp.sum(x32, axis=0, keepdims=True) / n
        ex2 = jnp.sum(jnp.square(x32), axis=0, keepdims=True) / n
        var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    else:
        m = mask.astype(jnp.float32)[:, None]
        n = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(x32 * m, axis=0, keepdims=True) / n
        var = jnp.sum(jnp.square(x32 - mean) * m, axis=0, keepdims=True) / n
    out = ((x32 - mean) / jnp.sqrt(var + eps)).astype(x.dtype)
    if mask is not None:
        out = out * mask.astype(x.dtype)[:, None]
    return out


def ada_instance_norm(x, gamma, beta, eps: float = 1e-5, mask=None,
                      zero_tail: bool = False):
    """AdaIN: instance norm over time + style-conditioned affine [C].
    Parity: kokoro/model.cpp:93-100 (norm + x*gamma + x + beta pattern)."""
    xn = instance_norm_time(x, eps=eps, mask=mask, zero_tail=zero_tail)
    out = xn * (1.0 + gamma).astype(x.dtype) + beta.astype(x.dtype)
    if mask is not None:
        out = out * mask.astype(x.dtype)[:, None]
    return out


# Minimax fit of sin^2(pi*r)/r^2 over r in [-1/2, 1/2] (degree 6 in s=r^2,
# max abs error 7.7e-10; f32 evaluation incl. range reduction measured
# 5.4e-6 over |alpha*x|<60 — far under the 1e-4 parity and 5e-4 golden
# tolerances).  Ascending powers of s.
_SIN2_POLY = (9.8696044004342909, -32.469696735562913, 42.728389790226231,
              -30.121841925204695, 13.207344107547643, -3.9158874684971994,
              0.74598669778179405)


def _sin2(t):
    """sin^2(t) as s*p(s) with s = range-reduced phase squared.

    XLA's full-precision `sin` lowering dominated the Kokoro generator's
    VPU time (0.073 ms per [23040,128] call vs a 0.005 ms memory floor —
    tools/kokoro_mrf_bisect.py).  sin^2 is pi-periodic and even, so reduce
    u = t/pi to r = u - round(u) in [-1/2, 1/2] and evaluate an even
    polynomial: ~12 simple VPU ops, no quadrant selects.  s*p(s) is exactly
    0 at t=0, preserving the padded-tail-zero bucketing invariant."""
    u = t * jnp.float32(1.0 / math.pi)
    r = u - jnp.round(u)
    s = r * r
    p = jnp.float32(_SIN2_POLY[-1])
    for c in _SIN2_POLY[-2::-1]:
        p = p * s + jnp.float32(c)
    return s * p


def snake(x, alpha):
    """Snake activation x + sin^2(alpha*x)/alpha (arXiv 2006.08195).
    Parity: src/util.cpp:96-101.  alpha is per-channel [C], x is [T, C].
    The phase is computed in f32 (bf16 phase rounding cost accuracy for
    free — the polynomial is cheaper than XLA's sin either way)."""
    a = alpha.astype(jnp.float32)
    t = x.astype(jnp.float32) * a
    return x + (_sin2(t) / a).astype(x.dtype)


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, x * negative_slope)
