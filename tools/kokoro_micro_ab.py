"""Three micro A/Bs for the synthesize critical path, same-session:

1. sine-source noise: threefry `jax.random.normal` vs the on-chip RBG
   (`jax.random.key(seed, impl='rbg')`) — fori-differential device time.
2. dispatch wrapper: aot.call_cached's jax.jit(exported.call) vs the direct
   per-bucket jit — p50 wall of the same fused call.
3. upload: jnp.asarray(arr) then call vs passing the numpy array straight
   to the jitted fn.

PYTHONPATH=/root/repo:/root/.axon_site python tools/kokoro_micro_ab.py
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

from tts_tpu.convert.builder_kokoro import KokoroDims, write_kokoro_gguf
from tts_tpu.core.gguf import GGUFFile
from tts_tpu.models import kokoro as K
from tts_tpu.ops.stft import stft

path = os.environ.get("BENCH_KOKORO_GGUF", "/tmp/bench_kokoro_82m_cal26.gguf")
if not os.path.exists(path):
    write_kokoro_gguf(path, KokoroDims.kokoro_82m(), seed=0, duration_bias=-2.6)
with GGUFFile(path) as f:
    model = K.KokoroModel.from_gguf(f)
cfg = model.cfg
gen = model.params["decoder"]["generator"]

F = 192
F2 = 2 * F
N_LO, N_HI, REPS = 3, 13, 7
rng = np.random.default_rng(0)
f0c = jnp.asarray(rng.standard_normal(F2).astype(np.float32))
frame2_mask = jnp.asarray((np.arange(F2) < int(0.9 * F2)).astype(np.float32))


def bench(name, fn, x0):
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
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(chained(n, x0))
            per.append(time.perf_counter() - t0)
        return min(per)

    per_op = (wall(N_HI) - wall(N_LO)) / (N_HI - N_LO) * 1e3
    print(f"{name:34s} {per_op:8.3f} ms", flush=True)
    return per_op


def sine_stft(f0_curve, key):
    source = K._sine_source(cfg, f0_curve, frame2_mask, key)
    har = jnp.tanh(source @ gen["m_source_w"] + gen["m_source_b"])[:, 0]
    mag, phase = stft(har, model.window, cfg.n_fft, cfg.hop)
    return mag


bench("sine+stft threefry", lambda x: sine_stft(x, jax.random.PRNGKey(0)), f0c)
bench("sine+stft rbg",
      lambda x: sine_stft(x, jax.random.key(0, impl="rbg")), f0c)
# noise generation alone, both impls
S = F * cfg.up_sampling_factor
nh = cfg.harmonic_num + 1
bench("normal[S,nh] threefry",
      lambda x: jax.random.normal(jax.random.PRNGKey(0), (S, nh)) + x[0],
      f0c)
bench("normal[S,nh] rbg",
      lambda x: jax.random.normal(jax.random.key(0, impl="rbg"), (S, nh)) + x[0],
      f0c)

# ---- dispatch-wrapper + upload A/Bs (p50 wall, interleaved) ----------------
token_ids = list(range(2, 36))
Tb = 64
T = len(token_ids)
arr = np.zeros(Tb + 2, np.int32); arr[:T] = token_ids; arr[-2] = T
pack = model._voice_pack("af_heart")

direct = model._fused_packed(F)
jax.block_until_ready(direct(model.params, pack, jnp.asarray(arr), model.window))
model.synthesize(token_ids, "af_heart")        # warms the aot-wrapped path

from tts_tpu.runtime import aot
static = f"F={F}|tb={K.TRANSFER_BITS}|{cfg!r}"
args = (model.params, pack, jnp.asarray(arr), model.window)
key = aot.make_key("kokoro_fused_packed", static, args)

walls = {"direct jit": [], "aot-wrapped": [], "direct jit, np arr": []}
for _ in range(25):
    t0 = time.perf_counter()
    np.asarray(direct(model.params, pack, jnp.asarray(arr), model.window))
    walls["direct jit"].append((time.perf_counter() - t0) * 1e3)
    t0 = time.perf_counter()
    np.asarray(aot.call_cached("kokoro_fused_packed", static, direct,
                               model.params, pack, jnp.asarray(arr),
                               model.window, key=key))
    walls["aot-wrapped"].append((time.perf_counter() - t0) * 1e3)
    t0 = time.perf_counter()
    np.asarray(direct(model.params, pack, arr, model.window))
    walls["direct jit, np arr"].append((time.perf_counter() - t0) * 1e3)

for k, v in walls.items():
    v.sort()
    print(f"{k:34s} {v[len(v) // 2]:8.3f} ms p50", flush=True)
