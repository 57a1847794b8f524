"""Host-protocol probe: what does each host-side step of synthesize() cost
over the tunnel?

Times the SAME compiled fused graph (F from env, default 96) three ways:
  a) all-device-resident args, np.asarray(result)       — floor+device+D2H
  b) fresh numpy tokens/mask + new PRNGKey every call   — synthesize() today
  c) b + block_until_ready before np.asarray            — the anti-pattern
Differences isolate the H2D upload cost and the extra round trip a blocking
wait adds.  reps are medians; run on a quiet chip.
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

F = int(os.environ.get("F", "96"))
Tb = 64
token_ids = list(range(2, 36))
T = len(token_ids)
tokens_np = np.zeros(Tb, np.int32); tokens_np[:T] = token_ids
mask_np = np.zeros(Tb, np.float32); mask_np[:T] = 1.0
style_gen, style_pros = model.voice_style("af_heart", T)
fn = model._fused(F)

dev_args = (model.params, jnp.asarray(tokens_np), jnp.asarray(mask_np),
            style_gen, style_pros, jax.random.PRNGKey(0), model.window)
jax.block_until_ready(dev_args)
np.asarray(fn(*dev_args))    # compile+warm

REPS = 15


def med(samples):
    s = sorted(samples)
    return s[len(s) // 2]


def probe(name, call):
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        call()
        walls.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:42s} p50 {med(walls):7.1f} ms   min {min(walls):7.1f}",
          flush=True)


probe("a) device-resident args -> asarray",
      lambda: np.asarray(fn(*dev_args)))

seed_ctr = iter(range(10_000))


def fresh_call(block=False):
    args = (model.params, jnp.asarray(tokens_np), jnp.asarray(mask_np),
            style_gen, style_pros, jax.random.PRNGKey(next(seed_ctr)),
            model.window)
    out = fn(*args)
    if block:
        out.block_until_ready()
    return np.asarray(out)


probe("b) fresh numpy args -> asarray", fresh_call)
probe("c) fresh args -> block -> asarray", lambda: fresh_call(block=True))
