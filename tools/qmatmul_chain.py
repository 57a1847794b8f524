#!/usr/bin/env python
"""Locate the in-loop vs isolated qmatmul bandwidth gap (Q4 decode path).

orpheus_step_breakdown measured the 28-layer linears chain at ~410 GB/s
effective while qmatmul_bw's single-shape loops stream at 725-898 GB/s.
This probe answers, in ONE XLA compile (compiles ship over the axon tunnel
at 10-20 min each, so per-segment jits are unaffordable):

  1. per-shape ISOLATED M=1 block-diagonal bandwidth, incl. the never-
     measured small o-projection [3072, 3072];
  2. the CHAINED per-layer sequence (qkv->o->gateup->down) x 28 — should
     reproduce the breakdown's 3413 us if the gap is per-kernel, or come in
     faster if the gap is elsewhere in `_orpheus_body`;
  3. the M=8 whole-K kernel (speculative verify-window path) per shape at
     tile_n 256 (production default) / 512 / 1024 — the weight-stream floor
     of the 517 tok/s spec-greedy record, and whether larger N tiles help;
  4. M=1 whole-K o-proj at the three tile sizes (is block-diag the right
     call at the small shape?).

Design: one jitted probe takes every weight set as ARGUMENTS (closure-
captured device arrays would bake 600 MB into the HLO as constants — the
r4/r5 breakdown runs never finished because of that) plus an int32 counts
vector, and runs one `lax.fori_loop` per segment chained through a scalar
carry.  A segment's per-iteration time is (wall(counts=e_i * n_i) -
wall(zeros)) / n_i, best-of-3, so the tunnel dispatch floor cancels.

Run on the TPU host:
  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/qmatmul_chain.py
Smoke (plumbing only, CPU interpret): SMOKE=1 python tools/qmatmul_chain.py
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
N_LAYERS = 2 if SMOKE else 28

# Orpheus decode shapes (K, N); head is tile-padded as in production
# (vocab 157184 -> 157440 at tile 256).  "head_pad" pads to 157696 so the
# 512/1024 N tiles divide (157696 = 512*308 = 1024*154) — +0.3% bytes.
if SMOKE:
    SHAPES = {"qkv": (256, 512), "o": (256, 256), "gateup": (256, 768),
              "down": (512, 256), "head": (256, 1280), "head_pad": (256, 1536)}
else:
    SHAPES = {"qkv": (3072, 5120), "o": (3072, 3072),
              "gateup": (3072, 16384), "down": (8192, 3072),
              "head": (3072, 157440), "head_pad": (3072, 157696)}


def q4_bytes(K, N):
    return K // 2 * N + K // 32 * N * 2


def make_weights():
    rng = np.random.default_rng(0)
    w = {}
    for name, (K, N) in SHAPES.items():
        w[name] = {
            "wq4": jnp.asarray(rng.integers(-128, 127, (K // 2, N))
                               .astype(np.int8)),
            "sc": jnp.asarray(((rng.random((K // 32, N)) + 0.5) * 0.01)
                              .astype(np.float16).view(np.uint16)),
        }
    for M in (1, 8):
        for K in sorted({K for K, _ in SHAPES.values()}):
            w[f"x{M}_{K}"] = jnp.asarray(
                rng.standard_normal((M, K)).astype(np.float32))
    return w


# segment registry: (label, bytes/iter, body(w, c) -> new scalar carry)
SEGMENTS = []


def seg(label, nbytes, body):
    SEGMENTS.append((label, nbytes, body))


def mm(w, name, M, c, tile_n=256, cap=1):
    K, N = SHAPES[name]
    x = w[f"x{M}_{K}"] * (1.0 + c * 1e-30)
    y = quantized_matmul_q4(x, w[name]["wq4"], w[name]["sc"],
                            tile_n=tile_n, block_diag_m_cap=cap)
    return y[0, 0] * 1e-30


# 1. isolated M=1 block-diag (production sequential-decode path)
for name in ("qkv", "o", "gateup", "down", "head"):
    seg(f"m1 blockdiag {name}", q4_bytes(*SHAPES[name]),
        lambda w, c, n=name: mm(w, n, 1, c))

# 2. chained layer sequence (the breakdown's `linears` sub-graph shape)
_chain_bytes = N_LAYERS * sum(q4_bytes(*SHAPES[n])
                              for n in ("qkv", "o", "gateup", "down"))


def chain_body(w, c):
    K_h = SHAPES["o"][0]
    K_d = SHAPES["down"][0]
    out = w["x1_" + str(K_h)] * (1.0 + c * 1e-30)
    zd = w["x1_" + str(K_d)]
    for _ in range(N_LAYERS):
        qkv = quantized_matmul_q4(out, w["qkv"]["wq4"], w["qkv"]["sc"])
        o = quantized_matmul_q4(qkv[:, :K_h] * 1e-30 + out,
                                w["o"]["wq4"], w["o"]["sc"])
        gu = quantized_matmul_q4(o * 1e-30 + out,
                                 w["gateup"]["wq4"], w["gateup"]["sc"])
        dn = quantized_matmul_q4(gu[:, :K_d] * 1e-30 + zd,
                                 w["down"]["wq4"], w["down"]["sc"])
        out = out + dn[:, :K_h] * 1e-30
    return out[0, 0] * 1e-30


seg(f"m1 chain {N_LAYERS}x(qkv,o,gateup,down)", _chain_bytes, chain_body)

# 3. M=8 whole-K (spec verify window) at tile_n 256/512/1024
for tn in (256, 512, 1024):
    for name in ("qkv", "o", "gateup", "down", "head", "head_pad"):
        K, N = SHAPES[name]
        if N % tn != 0:
            continue
        if name == "head" and tn != 256:
            continue            # ragged at 512/1024; head_pad covers those
        if name == "head_pad" and tn == 256:
            continue            # identical to "head" modulo +0.3% bytes
        if (K // 2) * tn > (2 << 20):
            continue            # VMEM: >2 MB double-buffered weight block
        seg(f"m8 wholeK tn={tn:4d} {name}", q4_bytes(K, N),
            lambda w, c, n=name, t=tn: mm(w, n, 8, c, tile_n=t, cap=1))

# 4. M=1 whole-K o-proj (block-diag alternative at the small shape)
for tn in (256, 512, 1024):
    if SHAPES["o"][1] % tn == 0:
        seg(f"m1 wholeK tn={tn:4d} o", q4_bytes(*SHAPES["o"]),
            lambda w, c, t=tn: mm(w, "o", 1, c, tile_n=t, cap=0))


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
    # per-segment iteration counts sized for ~12 GB of extra weight reads
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
    wall([0] * S)                     # compile + warm
    print(f"compiled in {time.time() - t0:.0f}s", flush=True)
    t_base = wall([0] * S)
    print(f"baseline wall {t_base * 1e3:.1f} ms", flush=True)
    for i, (label, nbytes, _) in enumerate(SEGMENTS):
        counts = [0] * S
        counts[i] = iters[i]
        dt = (wall(counts) - t_base) / iters[i]
        gbps = nbytes / dt / 1e9
        print(f"{label:36s} {dt * 1e6:9.1f} us/iter  {gbps:6.1f} GB/s "
              f"({gbps / PEAK_GBPS:4.0%})  [{nbytes / 1e6:7.1f} MB x "
              f"{iters[i]}]", flush=True)


if __name__ == "__main__":
    main()
