"""STFT / iSTFT as dense DFT matmuls — the patched-GGML ops, TPU style.

The reference needed custom ggml_stft/ggml_istft kernels (SURVEY.md §2.7,
src/util.cpp:111-130, 202-217).  On TPU the n_fft involved is tiny (Kokoro:
n_fft=20, hop=5), so framing + a [n_fft, 2*bins] DFT matmul is both exact and
MXU-friendly; XLA fuses the framing gather into the matmul.

Conventions (matching the reference / torch.stft(center=True)):
  * center framing: input reflect-padded by n_fft/2 on both sides
  * stft produces F = len(x)//hop + 1 frames
  * one-sided spectra: bins = n_fft//2 + 1, returned as (magnitude, phase)
  * istft of F frames produces (F-1)*hop samples, normalized by the running
    window^2 overlap sum (util.cpp:202-217)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def hann_window(n_fft: int) -> np.ndarray:
    """sin^2 window, parity with util.cpp:132-137 (periodic hann)."""
    i = np.arange(n_fft)
    return np.square(np.sin(np.pi * i / n_fft)).astype(np.float32)


def _dft_bases(n_fft: int, n_bins: int):
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), -np.sin(ang).astype(np.float32)


def frame_signal(x, n_fft: int, hop: int, n_frames: int):
    """[T] -> [n_frames, n_fft] centered frames (reflect padded)."""
    half = n_fft // 2
    xp = jnp.pad(x, (half, half + n_fft), mode="reflect")
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return xp[idx]


def stft(x, window, n_fft: int, hop: int):
    """x: [T] -> (magnitude [F, bins], phase [F, bins]), F = T//hop + 1.

    Implemented as one strided convolution with windowed DFT kernels — the
    framing gather is folded into the conv, which XLA compiles and runs far
    better than an explicit gather at megasample lengths."""
    from jax import lax

    n_bins = n_fft // 2 + 1
    half = n_fft // 2
    xp = jnp.pad(x, (half, half), mode="reflect")
    cos_b, sin_b = _dft_bases(n_fft, n_bins)          # [n_fft, bins]
    win = window.reshape(-1, 1)
    kern = jnp.concatenate([cos_b * win, sin_b * win], axis=1)  # [n_fft, 2*bins]
    kern = kern.T[:, None, :]                         # [2*bins, 1, n_fft]
    out = lax.conv_general_dilated(
        xp[None, None, :], kern, window_strides=(hop,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)[0].T      # [F, 2*bins]
    re, im = out[:, :n_bins], out[:, n_bins:]
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    phase = jnp.arctan2(im, re)
    return mag, phase


def istft(mag, phase, window, window_sq_sum, n_fft: int, hop: int):
    """(mag, phase) [F, bins] -> [(F-1)*hop] samples.

    Inverse one-sided DFT per frame, windowed overlap-add with the reference's
    center offset (first frame centered at sample 0), normalized by
    `window_sq_sum` ([F*hop], precomputed by `window_squared_sum`).
    """
    n_frames, n_bins = mag.shape
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    # irfft via matmul: x[n] = (1/N) * sum_k w_k * (re_k cos + im_k sin)
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    # one-sided spectrum: double non-DC/non-Nyquist bins
    scale = np.ones(n_bins, np.float32) * 2.0
    scale[0] = 1.0
    if n_fft % 2 == 0:
        scale[-1] = 1.0
    cos_i = (np.cos(ang) * scale[None, :] / n_fft).astype(np.float32)
    sin_i = (np.sin(ang) * scale[None, :] / n_fft).astype(np.float32)
    # x_n = (1/N) sum_k scale_k (re_k cos - im_k sin)   [true-DFT im convention]
    frames = re @ cos_i.T - im @ sin_i.T          # [F, n_fft]
    frames = frames * window[None, :]

    out_len = (n_frames - 1) * hop
    half = n_fft // 2
    # overlap-add as a transposed conv with an identity kernel: channel i of
    # frame f lands at sample f*hop + i (fast to compile and MXU-friendly)
    from tts_tpu.ops.conv import conv_transpose1d

    ident = jnp.eye(n_fft, dtype=frames.dtype).reshape(n_fft, 1, n_fft)
    out = conv_transpose1d(frames, ident, stride=hop)[:, 0]
    # out has length (F-1)*hop + n_fft; frame f covers [f*hop - half, ...)
    out = out[half : half + out_len]
    return out / window_sq_sum


def window_squared_sum(window: np.ndarray, n_fft: int, hop: int,
                       n_frames: int, out_len: int | None = None) -> np.ndarray:
    """Accumulated window^2 for iSTFT normalization (host-side, numpy).
    `n_frames` is the spectrum frame count F; output covers (F-1)*hop samples.
    Parity: util.cpp:202-217.  `out_len` pads the tail with ones for bucketed
    execution."""
    cutoff = (n_frames - 1) * hop
    half = n_fft // 2
    tgt = np.zeros(max(cutoff, 1), np.float32)
    w2 = np.square(window.astype(np.float32))
    # vectorized: window tap j contributes w2[j] at samples f*hop + (j - half)
    # for every frame f -> one strided slice-add per tap (n_fft tiny)
    for j in range(n_fft):
        start = j - half
        lo_f = (-start + hop - 1) // hop if start < 0 else 0
        hi_f = min(n_frames, (cutoff - start + hop - 1) // hop)
        if hi_f > lo_f:
            tgt[lo_f * hop + start : hi_f * hop + start : hop] += w2[j]
    tgt[tgt == 0] = 1e-6
    if out_len is not None and out_len > cutoff:
        tgt = np.concatenate([tgt, np.ones(out_len - cutoff, np.float32)])
    return tgt
