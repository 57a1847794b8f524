"""A/B: params-as-pytree (~590 arg leaves) vs ONE flat f32 buffer for the
kokoro fused dispatch, rep-by-rep interleaved under the SAME session floor
(CLAUDE.md methodology).

FLAT_PARAMS is read at trace time (the jit wrapper branches on it), so two
model instances trace under different flags, then reps alternate.

PYTHONPATH=/root/repo:/root/.axon_site python tools/kokoro_flat_ab.py
"""
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tts_tpu.convert.builder_kokoro import KokoroDims, write_kokoro_gguf
from tts_tpu.core.gguf import GGUFFile
from tts_tpu.models import kokoro as K

path = os.environ.get("BENCH_KOKORO_GGUF", "/tmp/bench_kokoro_82m_cal26.gguf")
if not os.path.exists(path):
    write_kokoro_gguf(path, KokoroDims.kokoro_82m(), seed=0, duration_bias=-2.6)

token_ids = list(range(2, 36))
REPS = int(os.environ.get("REPS", "25"))

models = {}
for flat in (False, True):
    K.FLAT_PARAMS = flat
    with GGUFFile(path) as f:
        m = K.KokoroModel.from_gguf(f)
    m.synthesize(token_ids, "af_heart")      # trace+compile under this flag
    m.synthesize(token_ids, "af_heart")
    models[flat] = m

walls = {False: [], True: []}
outs = {}
for _ in range(REPS):
    for flat in (False, True):
        K.FLAT_PARAMS = flat
        t0 = time.perf_counter()
        outs[flat] = models[flat].synthesize(token_ids, "af_heart")
        walls[flat].append((time.perf_counter() - t0) * 1e3)

for flat in (False, True):
    w = sorted(walls[flat])
    name = "flat buffer " if flat else "params tree"
    print(f"{name}  p50 {w[len(w) // 2]:8.3f} ms   min {w[0]:8.3f} ms",
          flush=True)

a, b = outs[False], outs[True]
n = min(a.size, b.size)
err = np.abs(a[:n] - b[:n]).max()
print(f"max |tree - flat| = {err:.3e}")
