"""Per-call wall decomposition of the CURRENT packed synthesize() at the
serving bucket: where do the ~50 ms per-utterance walls come from when the
device compute is only ~7 ms (tools/kokoro_stage_split2.py)?

Times, on a quiet chip, medians over REPS:
  floor1   — 1-element readback of a trivial dispatch (tunnel round trip)
  dev      — fused F dispatch, all args device-resident, 1-element readback
  dl       — same + FULL padded int16 readback (D2H payload cost)
  up+dl    — fresh packed-int32 upload every call + full readback
             (= synthesize()'s transfer pattern)
  synth    — model.synthesize() end to end (host pack/unpack included)
  synth2   — synthesize() with the upload issued via jax.device_put
             immediately (checks whether splitting upload from dispatch
             changes pipelining)

PYTHONPATH=/root/repo:/root/.axon_site python tools/kokoro_wall_probe.py
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
from tts_tpu.models.kokoro import KokoroModel, TOKEN_BUCKETS, pick_bucket

path = os.environ.get("BENCH_KOKORO_GGUF", "/tmp/bench_kokoro_82m_cal26.gguf")
if not os.path.exists(path):
    write_kokoro_gguf(path, KokoroDims.kokoro_82m(), seed=0, duration_bias=-2.6)
with GGUFFile(path) as f:
    model = KokoroModel.from_gguf(f)
cfg = model.cfg

F = int(os.environ.get("F", "192"))
token_ids = list(range(2, 42))
T = len(token_ids)
Tb = pick_bucket(T, TOKEN_BUCKETS)
arr = np.zeros(Tb + 2, np.int32)
arr[:T] = token_ids
arr[-2] = T
arr[-1] = 0
pack = model._voice_pack("af_heart")
fused = model._fused_packed(F)

arr_dev = jnp.asarray(arr)
out = fused(model.params, pack, arr_dev, model.window)
np.asarray(out)                     # compile + warm
model.synthesize(token_ids, "af_heart", seed=0)   # warm its own bucket too

REPS = 15


def probe(name, call):
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        call()
        walls.append((time.perf_counter() - t0) * 1e3)
    walls.sort()
    print(f"{name:12s} p50 {walls[len(walls)//2]:7.2f} ms   "
          f"min {walls[0]:7.2f}", flush=True)


tiny = jax.jit(lambda x: x + 1)
z = jnp.zeros((8,), jnp.float32)
np.asarray(tiny(z))
probe("floor1", lambda: np.asarray(tiny(z)).ravel()[:1])
probe("dev", lambda: np.asarray(fused(model.params, pack, arr_dev,
                                      model.window))[:1])
probe("dl", lambda: np.asarray(fused(model.params, pack, arr_dev,
                                     model.window)))
probe("up+dl", lambda: np.asarray(fused(model.params, pack, jnp.asarray(arr),
                                        model.window)))


def synth():
    model.synthesize(token_ids, "af_heart", seed=0)


probe("synth", synth)


def synth2():
    a = jax.device_put(arr)
    np.asarray(fused(model.params, pack, a, model.window))


probe("synth2(dput)", synth2)
