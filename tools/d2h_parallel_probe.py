"""Can concurrent readbacks of separate device arrays overlap on the axon
tunnel?  The D2H curve (kokoro_wall_decomp.py) shows ~2.5 ms fixed +
~36 ms/MB marginal per transfer (~20 MB/s); the F=192 audio buffer costs
10.7 ms.  If transfers ride separate HTTP requests that the tunnel serves
concurrently, fetching K slices from K threads should cut that toward
fixed + marginal/K.

PYTHONPATH=/root/repo:/root/.axon_site python tools/d2h_parallel_probe.py
"""
import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

N = 115204  # the F=192 packed audio size
REPS = int(os.environ.get("REPS", "15"))


def p50(call, reps=REPS):
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        call()
        walls.append((time.perf_counter() - t0) * 1e3)
    walls.sort()
    return walls[len(walls) // 2]


tiny = jax.jit(lambda x: x + 1)
z = jnp.zeros((8,), jnp.float32)
np.asarray(tiny(z))
floor = p50(lambda: np.asarray(tiny(z)))
print(f"floor                 {floor:8.3f} ms", flush=True)

for K in (1, 2, 4, 8):
    n = N // K

    g = jax.jit(lambda x, n=n, K=K: tuple(
        jnp.broadcast_to(x.astype(jnp.int16) + i, (n,)) for i in range(K)))
    jax.block_until_ready(g(z[:1]))
    pool = ThreadPoolExecutor(K)

    def fetch(pool=pool, K=K, g=g):
        # fresh dispatch per rep — jax.Array caches its host copy after the
        # first np.asarray, so re-fetching the same array is free/fake
        outs = g(z[:1])
        if K == 1:
            return np.asarray(outs[0])
        return list(pool.map(np.asarray, outs))

    fetch()
    w = p50(fetch)
    print(f"K={K} x int16[{n:6d}]   {w:8.3f} ms  (-floor {w - floor:7.3f})",
          flush=True)
