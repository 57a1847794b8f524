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

    Framing is hop-phase slicing: when hop divides n_fft, frame tap
    i = c*hop + r of frame f reads padded sample (f+c)*hop + r, so the
    [F, n_fft] frame matrix is n_fft/hop static shifted views of the padded
    signal reshaped [*, hop] — no gather, no conv, just one [F, n_fft] @
    [n_fft, 2*bins] DFT matmul.  (The previous single-channel NCH conv
    formulation ran ~10x slower on v5e: 1 of 128 lanes carried data.)"""
    from jax import lax

    n_bins = n_fft // 2 + 1
    half = n_fft // 2
    xp = jnp.pad(x, (half, half), mode="reflect")
    cos_b, sin_b = _dft_bases(n_fft, n_bins)          # [n_fft, bins]
    win = window.reshape(-1, 1).astype(jnp.float32)
    kern = jnp.concatenate([cos_b * win, sin_b * win], axis=1)  # [n_fft, 2*bins]
    T = x.shape[0]
    F = T // hop + 1
    if n_fft % hop == 0:
        n_chunks = n_fft // hop
        # len(xp) = T + n_fft >= (F-1+c)*hop + hop for every c < n_chunks
        views = [lax.slice(xp, (c * hop,), (c * hop + F * hop,)).reshape(F, hop)
                 for c in range(n_chunks)]
        frames = jnp.concatenate(views, axis=1)       # [F, n_fft]
        out = frames.astype(jnp.float32) @ kern       # [F, 2*bins]
    else:
        ck = kern.T[:, None, :]                       # [2*bins, 1, n_fft]
        out = lax.conv_general_dilated(
            xp[None, None, :], ck, window_strides=(hop,), padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32)[0].T  # [F, 2*bins]
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
    if n_fft % hop == 0 and half % hop == 0:
        # hop-phase overlap-add: output sample m*hop + r receives frame tap
        # c*hop + r from frame m + half/hop - c, so OLA is n_fft/hop shifted
        # [F-1, hop] slice adds — exact f32 adds, no conv.  (The identity-
        # kernel conv_transpose this replaces wrote a single-channel [S, 1]
        # — 1 of 128 lanes — and cost ~1.6 ms at S=115k on v5e vs ~12 us;
        # its MXU pass also rounded the f32 frames through bf16 passes.)
        from jax import lax

        n_chunks = n_fft // hop
        halfc = half // hop
        fp = jnp.pad(frames, ((n_chunks - 1 - halfc, halfc), (0, 0)))
        acc = None
        for c in range(n_chunks):
            sl = lax.slice(fp, ((n_chunks - 1) - c, c * hop),
                           ((n_chunks - 1) - c + n_frames - 1, (c + 1) * hop))
            acc = sl if acc is None else acc + sl
        out = acc.reshape(-1)
    else:
        # overlap-add as a transposed conv with an identity kernel
        from tts_tpu.ops.conv import conv_transpose1d

        ident = jnp.eye(n_fft, dtype=frames.dtype).reshape(n_fft, 1, n_fft)
        out = conv_transpose1d(frames, ident, stride=hop)[:, 0]
        # out has length (F-1)*hop + n_fft; frame f covers [f*hop - half, ..)
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
