"""Bisect Kokoro per-utterance wall time WITHOUT new per-experiment jits:
time the already-bucketed fused graph across frame buckets F (same tokens).
The F-slope is the per-frame generator cost; the intercept minus the
measured tunnel floor is the token-rate (albert + duration + LSTM) cost.

Everything here reuses the EXACT graphs bench.py compiles (persistent XLA
cache + AOT export cache make them warm), so a probe run costs seconds, not
compile-minutes.  Wall is split into dispatch->ready (device + dispatch
latency) and the D2H transfer of the packed int16 buffer (which grows with
the bucket, not the true audio length).
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
from tts_tpu.models.kokoro import KokoroModel
from tts_tpu.runtime.aot import call_cached

path = os.environ.get("BENCH_KOKORO_GGUF", "/tmp/bench_kokoro_82m_cal26.gguf")
if not os.path.exists(path):
    print("building bench gguf...")
    write_kokoro_gguf(path, KokoroDims.kokoro_82m(), seed=0, duration_bias=-2.6)
with GGUFFile(path) as f:
    model = KokoroModel.from_gguf(f)
cfg = model.cfg

# --- tunnel floor: trivial cached dispatch + 4-byte readback ---------------
tiny = jax.jit(lambda x: x + 1)
z = jnp.zeros((), jnp.int32)
for _ in range(3):
    np.asarray(tiny(z))
floors = []
for _ in range(10):
    t0 = time.perf_counter()
    np.asarray(tiny(z))
    floors.append((time.perf_counter() - t0) * 1e3)
floors.sort()
print(f"tunnel floor (tiny dispatch+readback): p50 {floors[5]:.1f} ms "
      f"min {floors[0]:.1f} ms max {floors[-1]:.1f} ms", flush=True)

# --- fused graph vs frame bucket ------------------------------------------
Tb = 64
token_ids = list(range(2, 36))  # ~34 tokens, mid-length sentence
T = len(token_ids)
tokens = np.zeros(Tb, np.int32)
tokens[:T] = token_ids
mask = np.zeros(Tb, np.float32)
mask[:T] = 1.0
tokens_j, mask_j = jnp.asarray(tokens), jnp.asarray(mask)
style_gen, style_pros = model.voice_style("af_heart", T)
key = jax.random.PRNGKey(0)

REPS = 7
rows = []
BUCKETS = tuple(int(b) for b in os.environ.get(
    "BUCKETS", "96,128,160,192,256,320,448").split(","))
for F in BUCKETS:
    fn = model._fused(F)
    args = (model.params, tokens_j, mask_j, style_gen, style_pros, key,
            model.window)
    t0 = time.perf_counter()
    out = call_cached("kokoro_fused", f"F={F}|{cfg!r}", fn, *args)
    np.asarray(out)
    t_first = (time.perf_counter() - t0) * 1e3
    ready_ms, total_ms = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        out.block_until_ready()
        t1 = time.perf_counter()
        host = np.asarray(out)
        t2 = time.perf_counter()
        ready_ms.append((t1 - t0) * 1e3)
        total_ms.append((t2 - t0) * 1e3)
    ready_ms.sort(); total_ms.sort()
    mb = out.size * 2 / 1e6
    rows.append((F, ready_ms[REPS // 2], total_ms[REPS // 2]))
    print(f"F={F:4d}: first={t_first:8.1f} ms  ready p50={ready_ms[REPS//2]:6.1f} "
          f"(min {ready_ms[0]:6.1f})  +D2H p50={total_ms[REPS//2]:6.1f} "
          f"(min {total_ms[0]:6.1f})  [{mb:.2f} MB]", flush=True)

# least-squares slope of ready-time vs F
Fs = np.array([r[0] for r in rows], float)
Rs = np.array([r[1] for r in rows], float)
A = np.vstack([Fs, np.ones_like(Fs)]).T
slope, intercept = np.linalg.lstsq(A, Rs, rcond=None)[0]
print(f"\nready-time fit: {slope * 1e3:.1f} us/frame, intercept {intercept:.1f} ms "
      f"(incl. dispatch floor {floors[5]:.1f} ms -> token-rate+fixed "
      f"~{intercept - floors[5]:.1f} ms)")
ts = np.array([r[2] - r[1] for r in rows], float)
print(f"D2H per-bucket: {ts.round(1).tolist()} ms for buckets {Fs.astype(int).tolist()}")
