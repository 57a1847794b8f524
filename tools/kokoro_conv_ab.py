"""A/B conv1d formulations at the Kokoro generator's level-1 rate.

Candidates (same math, same [T, C] time-major interface):
  nch    — current ops/conv.py (lax conv, NCH dims)
  nwc    — lax conv with NWC dims (no implicit transposes around the op)
  shift  — K shifted [T,C]@[C,C] matmuls, f32 accumulation (pure MXU form)
plus the iSTFT overlap-add: identity-kernel conv_transpose (writes a
single-channel [S,1] — 1 of 128 lanes) vs hop-phase shifted-slice sums.

Timing is differential in the chain length: each op jits ONE function whose
`lax.fori_loop` bound is traced, timed at N=10 and N=110 — the tunnel RTT
and dispatch floor cancel in the difference, so per-op = (w110 - w10)/100.
"""
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from tts_tpu.ops.conv import conv1d, conv_transpose1d

F = 192
W1, C1 = 120 * F, 128
rng = np.random.default_rng(0)
N_LO, N_HI = 10, 110


def bench(name, fn, *args, reps=7):
    @jax.jit
    def chained(n, *a):
        x0 = a[0]

        def body(i, acc):
            x = x0 + (acc * 1e-30).astype(x0.dtype)
            y = fn(x, *a[1:])
            return acc + y.sum().astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    for n in (N_LO, N_HI):
        np.asarray(chained(n, *args))          # compile + warm

    def wall(n):
        per = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chained(n, *args))
            per.append(time.perf_counter() - t0)
        return min(per)

    per_op = (wall(N_HI) - wall(N_LO)) / (N_HI - N_LO) * 1e3
    print(f"{name:46s} {per_op:7.3f} ms", flush=True)


def arr(*shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)


def conv_nwc(x, w, b=None, *, padding=0, dilation=1):
    out = lax.conv_general_dilated(
        x[None], w.transpose(2, 1, 0).astype(x.dtype),
        window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=x.dtype)[0]
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def conv_shift(x, w, b=None, *, padding=0, dilation=1):
    """'same'-style conv as K shifted matmuls accumulated in f32."""
    T = x.shape[0]
    k = w.shape[-1]
    wt = w.transpose(2, 1, 0).astype(x.dtype)   # [K, C_in, C_out]
    span = dilation * (k - 1)
    xp = jnp.pad(x, ((padding, span - padding), (0, 0)))
    acc = None
    for j in range(k):
        sl = jax.lax.dynamic_slice_in_dim(xp, j * dilation, T, 0)
        term = jax.lax.dot(sl, wt[j], preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.astype(x.dtype)


def conv_tapcat(x, w, b=None, *, padding=0, dilation=1):
    """Conv as ONE matmul: concat the K shifted views into [T, K*C] and hit
    [K*C, C_out] — larger contraction dim for MXU utilization at the cost of
    materializing K x the activation bytes."""
    T = x.shape[0]
    k = w.shape[-1]
    span = dilation * (k - 1)
    xp = jnp.pad(x, ((padding, span - padding), (0, 0)))
    taps = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(xp, j * dilation, T, 0) for j in range(k)],
        axis=1)                                        # [T, K*C]
    wt = w.transpose(2, 1, 0).reshape(k * w.shape[1], w.shape[0]).astype(x.dtype)
    acc = jax.lax.dot(taps, wt, preferred_element_type=jnp.float32)
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.astype(x.dtype)


x1 = arr(W1, C1)
w7 = arr(C1, C1, 7, dtype=jnp.float32)
w3 = arr(C1, C1, 3, dtype=jnp.float32)
w11 = arr(C1, C1, 11, dtype=jnp.float32)
b1 = arr(C1, dtype=jnp.float32)

bench("control x+1", lambda x: x + 1, x1)
for name, f in [("nch", conv1d), ("nwc", conv_nwc), ("shift", conv_shift),
                ("tapcat", conv_tapcat)]:
    bench(f"{name} k7 d1", lambda x, f=f: f(x, w7, b1, padding=3), x1)
    bench(f"{name} k7 d3", lambda x, f=f: f(x, w7, b1, padding=9, dilation=3), x1)
    bench(f"{name} k3 d1", lambda x, f=f: f(x, w3, b1, padding=1), x1)
    bench(f"{name} k11 d5", lambda x, f=f: f(x, w11, b1, padding=25, dilation=5), x1)

ref = np.asarray(conv1d(x1, w7, b1, padding=9, dilation=3), np.float32)
for name, f in [("nwc", conv_nwc), ("shift", conv_shift),
                ("tapcat", conv_tapcat)]:
    got = np.asarray(f(x1, w7, b1, padding=9, dilation=3), np.float32)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    print(f"{name} k7 d3 rel err vs nch: {err:.2e}", flush=True)

# ---- iSTFT overlap-add ----------------------------------------------------
n_fft, hop = 20, 5
Fr = W1 + 1
frames = arr(Fr, n_fft, dtype=jnp.float32)


def ola_convt(fr):
    ident = jnp.eye(n_fft, dtype=fr.dtype).reshape(n_fft, 1, n_fft)
    out = conv_transpose1d(fr, ident, stride=hop)[:, 0]
    half = n_fft // 2
    return out[half : half + (Fr - 1) * hop]


def ola_shift(fr):
    n_chunks = n_fft // hop
    halfc = (n_fft // 2) // hop
    fp = jnp.pad(fr, ((n_chunks - 1 - halfc, halfc), (0, 0)))
    M = Fr - 1
    acc = None
    for c in range(n_chunks):
        sl = lax.dynamic_slice(fp, ((n_chunks - 1) - c, c * hop), (M, hop))
        acc = sl if acc is None else acc + sl
    return acc.reshape(-1)


bench("ola conv_transpose", ola_convt, frames)
bench("ola shifted-slice", ola_shift, frames)
a = np.asarray(ola_convt(frames))
b = np.asarray(ola_shift(frames))
print("ola match:", np.allclose(a, b, atol=1e-5), flush=True)
