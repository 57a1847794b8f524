"""A/B: today's synthesize() host protocol vs a packed single-upload one.

Current protocol per call: two fresh numpy H2D uploads (tokens, mask), two
style rows (numpy), plus a jax.random.PRNGKey() device computation — five
argument transfers ahead of the fused dispatch.  The packed variant uploads
ONE int32 array [Tb+2] = tokens | T | seed and derives the mask (iota < T),
the style rows (voice-pack gather by T) and the PRNG key (traced seed) inside
the jitted graph; the voice pack lives on device.

Both variants run the SAME fused compute body, interleaved rep-by-rep so they
share one session floor (CLAUDE.md: A/B under the SAME session's floor).
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

path = os.environ.get("BENCH_KOKORO_GGUF", "/tmp/bench_kokoro_82m_cal26.gguf")
if not os.path.exists(path):
    write_kokoro_gguf(path, KokoroDims.kokoro_82m(), seed=0, duration_bias=-2.6)
with GGUFFile(path) as f:
    model = KokoroModel.from_gguf(f)

cfg = model.cfg
F = int(os.environ.get("F", "96"))
Tb = 64
token_ids = list(range(2, 36))
T = len(token_ids)
voice = "af_heart"

pack_dev = model._voice_pack(voice)
fn_cur = model._fused(F)
fn_packed = model._fused_packed(F)


tokens_np = np.zeros(Tb, np.int32); tokens_np[:T] = token_ids
mask_np = np.zeros(Tb, np.float32); mask_np[:T] = 1.0
style_gen, style_pros = model.voice_style(voice, T)

seed_ctr = iter(range(100_000))


def call_current():
    return np.asarray(fn_cur(
        model.params, jnp.asarray(tokens_np), jnp.asarray(mask_np),
        style_gen, style_pros, jax.random.PRNGKey(next(seed_ctr)),
        model.window))


def call_packed():
    arr = np.zeros(Tb + 2, np.int32)
    arr[:T] = token_ids
    arr[-2] = T
    arr[-1] = next(seed_ctr)
    return np.asarray(fn_packed(model.params, pack_dev, jnp.asarray(arr),
                                model.window))


a, b = call_current(), call_packed()          # compile + warm
assert a.shape == b.shape, (a.shape, b.shape)
na, nb = a[:-4].astype(np.float32), b[:-4].astype(np.float32)
print(f"outputs agree: max int16 delta = {np.max(np.abs(na - nb)):.0f} "
      f"(PRNG seeds differ; shapes {a.shape})", flush=True)

REPS = 25
cur, pkd = [], []
for _ in range(REPS):
    t0 = time.perf_counter(); call_current(); cur.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); call_packed();  pkd.append(time.perf_counter() - t0)


def stats(name, xs):
    xs = sorted(x * 1e3 for x in xs)
    print(f"{name:28s} p50 {xs[len(xs)//2]:7.1f} ms   min {xs[0]:7.1f}",
          flush=True)


stats("current (5 args + PRNGKey)", cur)
stats("packed (1 int32 upload)", pkd)
