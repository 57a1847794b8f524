#!/usr/bin/env python
"""Block-diagonal (kth, tn) tile sweep for the M=1 Q4 down projection.

qmatmul_chain measured the down projection [K=8192 -> N=3072] at 168 GB/s
under `_pick_tiles`' greedy choice (kth=1024, tn=1024) while every other
M=1 block-diag shape streams ~360-410 GB/s, and BOTH whole-K reroutes
measured SLOWER at the model level (cap=0: 198-201 vs 211 tok/s; down-only
K_CAP=4096: 197.1).  This probe asks whether the kernel itself is fine and
only the tile choice is wrong: one compile, every legal (kth, tn) combo for
the down shape plus controls (qkv at its picked tiles; M=1 whole-K down,
never measured in isolation — config E's regression implies it is slow
in-graph too).

Same timing skeleton as qmatmul_chain.py: per-segment `lax.fori_loop`s
chained through a scalar carry, weights as jit ARGUMENTS, per-iteration
time = (wall(counts=e_i*n_i) - wall(zeros)) / n_i, best-of-3.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/qmv_down_sweep.py
Smoke: SMOKE=1 python tools/qmv_down_sweep.py
"""
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("SMOKE"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

from tts_tpu.ops.qmatmul import quantized_matmul_q4

PEAK_GBPS = 819.0
SMOKE = bool(os.environ.get("SMOKE"))

if SMOKE:
    DOWN = (512, 256)      # (K, N)
    QKV = (256, 512)
    COMBOS = [(128, 256), (256, 256)]
    WHOLEK_TN = [256]
else:
    DOWN = (8192, 3072)
    QKV = (3072, 5120)
    # kth divides K/2 = 4096; weight block kth*tn <= 2 MB
    COMBOS = [(512, 256), (512, 512), (512, 1024),
              (1024, 256), (1024, 512), (1024, 1024),   # (1024,1024) = current
              (2048, 256), (2048, 512)]
    WHOLEK_TN = [256, 512]


def q4_bytes(K, N):
    return K // 2 * N + K // 32 * N * 2


def make_weights():
    rng = np.random.default_rng(0)
    w = {}
    for name, (K, N) in (("down", DOWN), ("qkv", QKV)):
        w[name] = {
            "wq4": jnp.asarray(rng.integers(-128, 127, (K // 2, N))
                               .astype(np.int8)),
            "sc": jnp.asarray(((rng.random((K // 32, N)) + 0.5) * 0.01)
                              .astype(np.float16).view(np.uint16)),
        }
        w[f"x_{K}"] = jnp.asarray(
            rng.standard_normal((1, K)).astype(np.float32))
    return w


SEGMENTS = []


def seg(label, nbytes, body):
    SEGMENTS.append((label, nbytes, body))


def mm(w, name, K, c, **kw):
    x = w[f"x_{K}"] * (1.0 + c * 1e-30)
    y = quantized_matmul_q4(x, w[name]["wq4"], w[name]["sc"], **kw)
    return y[0, 0] * 1e-30


for kth, tn in COMBOS:
    if DOWN[1] % tn:
        continue
    seg(f"down blockdiag kth={kth:4d} tn={tn:4d}", q4_bytes(*DOWN),
        lambda w, c, k=kth, t=tn: mm(w, "down", DOWN[0], c,
                                     block_diag_tiles=(k, t)))
for tn in WHOLEK_TN:
    seg(f"down wholeK  m1       tn={tn:4d}", q4_bytes(*DOWN),
        lambda w, c, t=tn: mm(w, "down", DOWN[0], c,
                              tile_n=t, block_diag_m_cap=0))
seg("qkv blockdiag (picked)      ", q4_bytes(*QKV),
    lambda w, c: mm(w, "qkv", QKV[0], c))


@jax.jit
def probe(w, counts):
    c = jnp.float32(0.0)
    for i, (_, _, body) in enumerate(SEGMENTS):
        c = lax.fori_loop(0, counts[i], lambda _, cc, b=body: b(w, cc), c)
    return c


def main():
    print(f"backend: {jax.default_backend()}  segments: {len(SEGMENTS)}",
          flush=True)
    w = make_weights()
    jax.block_until_ready(w)
    S = len(SEGMENTS)
    target = 2e8 if SMOKE else 12e9
    iters = [max(2, int(round(target / b))) for _, b, _ in SEGMENTS]

    def wall(counts):
        cv = jnp.asarray(counts, jnp.int32)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(probe(w, cv))
            best = min(best, time.perf_counter() - t0)
        return best

    t0 = time.time()
    wall([0] * S)
    print(f"compiled in {time.time() - t0:.0f}s", flush=True)
    t_base = wall([0] * S)
    print(f"baseline wall {t_base * 1e3:.1f} ms", flush=True)
    for i, (label, nbytes, _) in enumerate(SEGMENTS):
        counts = [0] * S
        counts[i] = iters[i]
        dt = (wall(counts) - t_base) / iters[i]
        gbps = nbytes / dt / 1e9
        print(f"{label:30s} {dt * 1e6:9.1f} us/iter  {gbps:6.1f} GB/s "
              f"({gbps / PEAK_GBPS:4.0%})  [{nbytes / 1e6:7.1f} MB x "
              f"{iters[i]}]", flush=True)


if __name__ == "__main__":
    main()
