"""Up/down-sampling along time, replacing ggml_upscale_linear / ggml_upscale_ext
(SURVEY.md §2.7, used by Kokoro's harmonic source, kokoro/model.cpp:176-177)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_nearest(x, factor: int, axis: int = 0):
    """Repeat each element `factor` times along `axis` (ggml_upscale_ext)."""
    return jnp.repeat(x, factor, axis=axis)


def upsample_linear(x, factor: int, axis: int = 0):
    """Linear interpolation upsample by an integer factor along `axis`
    (align_corners=False convention, matching torch F.interpolate/ggml patch).
    """
    x = jnp.moveaxis(x, axis, 0)
    t = x.shape[0]
    out_t = t * factor
    # sample positions in input coordinates
    pos = (jnp.arange(out_t) + 0.5) / factor - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(lo + 1, 0, t - 1)
    frac = jnp.clip(pos - lo, 0.0, 1.0)
    shape = (out_t,) + (1,) * (x.ndim - 1)
    out = x[lo] * (1 - frac).reshape(shape) + x[hi] * frac.reshape(shape)
    return jnp.moveaxis(out, 0, axis)
