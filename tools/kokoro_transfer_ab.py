"""A/B: 16-bit vs 12-bit packed D2H transfer for kokoro synthesize, rep-by-rep
interleaved under the SAME session floor (CLAUDE.md methodology).

Two model instances trace their fused graphs under different TRANSFER_BITS
(the flag is read at trace time), then reps alternate 16/12.

PYTHONPATH=/root/repo:/root/.axon_site python tools/kokoro_transfer_ab.py
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
for bits in (16, 12):
    K.TRANSFER_BITS = bits
    with GGUFFile(path) as f:
        m = K.KokoroModel.from_gguf(f)
    m.synthesize(token_ids, "af_heart")      # trace+compile under this flag
    m.synthesize(token_ids, "af_heart")
    models[bits] = m

walls = {16: [], 12: []}
outs = {}
for _ in range(REPS):
    for bits in (16, 12):
        K.TRANSFER_BITS = bits       # host unpack branches on the flag too
        t0 = time.perf_counter()
        outs[bits] = models[bits].synthesize(token_ids, "af_heart")
        walls[bits].append((time.perf_counter() - t0) * 1e3)

for bits in (16, 12):
    w = sorted(walls[bits])
    print(f"{bits}-bit transfer  p50 {w[len(w) // 2]:8.3f} ms   "
          f"min {w[0]:8.3f} ms", flush=True)

a, b = outs[16], outs[12]
n = min(a.size, b.size)
peak = np.abs(a[:n]).max() + 1e-9
err = np.abs(a[:n] - b[:n]).max() / peak
print(f"max |16b - 12b| / peak = {err:.3e}  (bound 2*step ~ {2 / 2047:.3e})")
