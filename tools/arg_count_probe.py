"""Per-dispatch cost vs ARGUMENT COUNT over the axon tunnel.

kokoro_pre_split.py shows the fused graph's true device compute is ~3.5 ms
(pre 1.3 + tail 2.2) yet single-dispatch wall - floor is ~12 ms.  The fused
graph passes the params pytree = 755 separate buffer handles per dispatch;
this probe times a trivial jitted fn at increasing argument counts to
measure the per-handle dispatch cost directly.

PYTHONPATH=/root/repo:/root/.axon_site python tools/arg_count_probe.py
"""
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def p50(call, reps=15):
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
print(f"floor (1 arg)        {floor:8.3f} ms", flush=True)

for N in (8, 64, 256, 755):
    args = [jnp.full((8,), float(i)) for i in range(N)]
    jax.block_until_ready(args)

    @jax.jit
    def fn(*a):
        acc = a[0][0]
        for x in a[1:]:
            acc = acc + x[0]
        return acc

    np.asarray(fn(*args))
    w = p50(lambda: np.asarray(fn(*args)))
    print(f"N={N:4d} args         {w:8.3f} ms   (-floor {w - floor:8.3f})",
          flush=True)

# one big donated-style buffer for comparison: same bytes as the 82M model
big = jnp.zeros((81 * 1024 * 1024,), jnp.float32)
jax.block_until_ready(big)


@jax.jit
def fbig(b, x):
    return x + b[0]


np.asarray(fbig(big, z))
w = p50(lambda: np.asarray(fbig(big, z)))
print(f"1x 324MB buffer      {w:8.3f} ms   (-floor {w - floor:8.3f})",
      flush=True)
