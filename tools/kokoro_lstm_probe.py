"""True device cost of the kokoro biLSTMs vs scan `unroll`, fori-loop
differential method (floor cancels).  The fused graph runs four biLSTMs:
shared prosody at [F=192, 640->256], text-encoder at [Tb, 512->256] (x2),
duration at [Tb, 640->256]-ish — the scan's per-iteration overhead is the
suspected cost, not the [2,H]x[H,4H] matvec.

PYTHONPATH=/root/repo:/root/.axon_site python tools/kokoro_lstm_probe.py
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

from tts_tpu.ops.lstm import bilstm

rng = np.random.default_rng(0)
N_LO, N_HI = 4, 24


def bench(name, fn, x0, reps=7):
    @jax.jit
    def chained(n, x0):
        def body(i, acc):
            x = x0 + (acc * 1e-30).astype(x0.dtype)
            return acc + fn(x).astype(jnp.float32).ravel()[0]

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    for n in (N_LO, N_HI):
        np.asarray(chained(n, x0))

    def wall(n):
        per = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chained(n, x0))
            per.append(time.perf_counter() - t0)
        return min(per)

    per_op = (wall(N_HI) - wall(N_LO)) / (N_HI - N_LO) * 1e3
    print(f"{name:34s} {per_op:7.3f} ms", flush=True)


def make(T, Cin, H):
    x = jnp.asarray(rng.standard_normal((T, Cin)).astype(np.float32))
    mk = jnp.asarray((np.arange(T) < int(T * 0.85)).astype(np.float32))
    p = lambda: {"w_ih": jnp.asarray(rng.standard_normal((Cin, 4 * H)).astype(np.float32)) * 0.05,
                 "w_hh": jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32)) * 0.05,
                 "b": jnp.zeros(4 * H, jnp.float32)}
    return x, mk, p(), p()


for T, Cin, H, tag in ((192, 640, 256, "shared F=192"), (64, 512, 256, "textenc Tb=64")):
    x, mk, fwd, bwd = make(T, Cin, H)
    for u in (1, 4, 8, 16):
        bench(f"bilstm {tag} unroll={u}",
              lambda x, u=u, fwd=fwd, bwd=bwd, mk=mk: bilstm(x, fwd, bwd, mask=mk, unroll=u), x)
