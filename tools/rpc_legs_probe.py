"""Decompose the axon tunnel floor into its RPC legs, and measure the
host-side SUBMIT cost of dispatching the 592-leaf params pytree vs a single
flat buffer (is the execute request's per-buffer-handle serialization the
1.9 ms 'dispatch' bracket seen in synthesize?).

PYTHONPATH=/root/repo:/root/.axon_site python tools/rpc_legs_probe.py
"""
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tts_tpu.convert.builder_kokoro import KokoroDims, write_kokoro_gguf
from tts_tpu.core.gguf import GGUFFile
from tts_tpu.models import kokoro as K

path = os.environ.get("BENCH_KOKORO_GGUF", "/tmp/bench_kokoro_82m_cal26.gguf")
if not os.path.exists(path):
    write_kokoro_gguf(path, KokoroDims.kokoro_82m(), seed=0, duration_bias=-2.6)
with GGUFFile(path) as f:
    model = K.KokoroModel.from_gguf(f)

REPS = int(os.environ.get("REPS", "25"))


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

print(f"tiny block_until_ready  {p50(lambda: jax.block_until_ready(tiny(z))):8.3f} ms")
print(f"tiny np.asarray         {p50(lambda: np.asarray(tiny(z))):8.3f} ms", flush=True)

# big-output variants: does the readback leg separate from execution?
big = jax.jit(lambda x: jnp.broadcast_to(x.astype(jnp.int16), (115204,)))
np.asarray(big(z[:1]))
print(f"big  block_until_ready  {p50(lambda: jax.block_until_ready(big(z[:1]))):8.3f} ms")
print(f"big  np.asarray         {p50(lambda: np.asarray(big(z[:1]))):8.3f} ms", flush=True)

# submit cost: wall of the PYTHON call returning the async Array (no wait)
pt = jax.jit(lambda p, x: x + p["dp"]["f0_proj_b"])
jax.block_until_ready(pt(model.params, z[:1].reshape(())))
x0 = z[:1].reshape(())
outs = []
sub = p50(lambda: outs.append(pt(model.params, x0)))
jax.block_until_ready(outs)
print(f"submit params pytree    {sub:8.3f} ms (host-side, async return)")

flat = jnp.zeros((81 * 1024 * 1024,), jnp.float32)
pf = jax.jit(lambda f, x: x + f[0])
jax.block_until_ready(pf(flat, x0))
outs2 = []
sub2 = p50(lambda: outs2.append(pf(flat, x0)))
jax.block_until_ready(outs2)
print(f"submit 1 flat buffer    {sub2:8.3f} ms (host-side, async return)",
      flush=True)

# and the wall-clock difference end-to-end (does submit cost hide in RTT?)
print(f"wall params pytree      {p50(lambda: np.asarray(pt(model.params, x0))):8.3f} ms")
print(f"wall 1 flat buffer      {p50(lambda: np.asarray(pf(flat, x0))):8.3f} ms",
      flush=True)
