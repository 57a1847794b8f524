#!/usr/bin/env python
"""Microbenchmark: quantized matmul achieved HBM bandwidth on the real chip.

AR decode is weights-bandwidth-bound; the kernel's job is to stream quantized
weights at speed-of-light.  This times the int8 and int4 Pallas kernels (and
the dense bf16 matmul for reference) at Orpheus decode shapes (M=1) and
reports achieved GB/s vs the chip's ~819 GB/s HBM peak (v5e).  If achieved
bandwidth is far below peak the kernel is VPU-bound on dequant, not HBM-bound.

The host<->TPU tunnel costs 15-50 ms per dispatch, so ITERS invocations run
inside ONE jitted fori_loop (sequentialized through the carry so XLA cannot
hoist the matmul out of the loop).

Run on the TPU host: python tools/qmatmul_bw.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from tts_tpu.ops.qmatmul import quantized_matmul, quantized_matmul_q4

PEAK_GBPS = 819.0
ITERS_A, ITERS_B = 32, 288


def timed_loop(op):
    """One dispatch running `op` `iters` times, each iteration data-dependent
    on the previous result so the loop cannot be collapsed.  The per-iteration
    time is the WALL DIFFERENCE between two iteration counts — the tunnel's
    dispatch/transfer floor (tens of ms, wildly variable, and
    block_until_ready is unreliable on the axon platform) cancels out."""

    @partial(jax.jit, static_argnames=("iters",))
    def run(x, *ws, iters):
        def body(i, acc):
            xi = x * (1.0 + acc[0, :1] * 1e-30)
            return op(xi, *ws)

        return lax.fori_loop(0, iters, body, jnp.zeros_like(op(x, *ws)))

    return run


def bench(run, x, *ws):
    np.asarray(run(x, *ws, iters=ITERS_A))      # compile + warm
    np.asarray(run(x, *ws, iters=ITERS_B))

    def wall(iters):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(x, *ws, iters=iters))
            best = min(best, time.perf_counter() - t0)
        return best

    return (wall(ITERS_B) - wall(ITERS_A)) / (ITERS_B - ITERS_A)


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")
    # Orpheus decode shapes: qkv [3072, 5120], gate/up [3072, 16384],
    # down [8192, 3072], lm_head [3072, 157184]
    shapes = [(3072, 5120), (3072, 16384), (8192, 3072), (3072, 157184)]
    for K, N in shapes:
        x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
        wq = jnp.asarray(rng.integers(-127, 127, (K, N)).astype(np.int8))
        sc = jnp.asarray(((rng.random((K // 32, N)) * 0.01).astype(np.float16)).view(np.uint16))
        wq4 = jnp.asarray(rng.integers(-128, 127, (K // 2, N)).astype(np.int8))
        wbf = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32)).astype(jnp.bfloat16)

        t8 = bench(timed_loop(quantized_matmul), x, wq, sc)
        t4 = bench(timed_loop(quantized_matmul_q4), x, wq4, sc)
        tb = bench(timed_loop(
            lambda x, w: (x.astype(jnp.bfloat16) @ w).astype(jnp.float32)), x, wbf)
        b8 = (wq.nbytes + sc.nbytes) / t8 / 1e9
        b4 = (wq4.nbytes + sc.nbytes) / t4 / 1e9
        bb = wbf.nbytes / tb / 1e9
        print(f"[{K:5d}x{N:6d}] int8 {t8 * 1e6:8.1f} us  {b8:6.1f} GB/s ({b8 / PEAK_GBPS:4.0%})"
              f" | int4 {t4 * 1e6:8.1f} us  {b4:6.1f} GB/s ({b4 / PEAK_GBPS:4.0%})"
              f" | bf16 {tb * 1e6:8.1f} us  {bb:6.1f} GB/s ({bb / PEAK_GBPS:4.0%})")


if __name__ == "__main__":
    main()
