"""Map the axon tunnel's D2H readback cost vs payload size, same-session.

The 16-vs-12-bit transfer A/B (tools/kokoro_transfer_ab.py) showed a 25%
byte cut saves NOTHING at ~200 KB payloads, contradicting a bandwidth-linear
model — so the readback cost must be dominated by per-RPC/per-chunk latency
with step structure.  This probe walks int16 payload sizes and prints the
p50/min wall of a trivial jit returning that payload; subtract the smallest
size's wall to see the marginal cost curve and any chunk boundaries worth
steering the kokoro frame buckets around.

PYTHONPATH=/root/repo:/root/.axon_site python tools/d2h_size_curve.py
"""
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

REPS = int(os.environ.get("REPS", "15"))
# samples of int16: 16 KB .. 288 KB in 16 KB steps, plus tiny anchors
SIZES = [64, 4096] + [k * 8192 for k in range(1, 19)]

z = jnp.zeros((1,), jnp.int16)
fns = {}
for n in SIZES:
    fns[n] = jax.jit(lambda x, n=n: jnp.broadcast_to(x, (n,)))
    np.asarray(fns[n](z))          # compile + first call

walls = {n: [] for n in SIZES}
for _ in range(REPS):
    for n in SIZES:
        t0 = time.perf_counter()
        np.asarray(fns[n](z))
        walls[n].append((time.perf_counter() - t0) * 1e3)

base = None
for n in SIZES:
    w = sorted(walls[n])
    p50, mn = w[len(w) // 2], w[0]
    if base is None:
        base = mn
    print(f"{n * 2 / 1024:7.1f} KB   p50 {p50:7.3f} ms   min {mn:7.3f} ms   "
          f"marginal-min {mn - base:7.3f} ms", flush=True)
