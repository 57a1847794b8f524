"""Stage-level bisect, tunnel-proof timing: N chained dispatches then ONE
forced readback (np.asarray of a small leaf).  Per-call device time =
(wall - tunnel RTT - payload) / N.  block_until_ready is NOT trusted over
the axon tunnel (it can return before compute completes).
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
cfg = model.cfg

Tb = 64
token_ids = list(range(2, 36))
T = len(token_ids)
tokens = np.zeros(Tb, np.int32); tokens[:T] = token_ids
mask = np.zeros(Tb, np.float32); mask[:T] = 1.0
tokens_j, mask_j = jnp.asarray(tokens), jnp.asarray(mask)
style_gen, style_pros = model.voice_style("af_heart", T)
key = jax.random.PRNGKey(0)
N = 20


def leaf(out):
    x = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(x).ravel()[:1]


# measure the RTT+small-payload constant with a trivial dispatch
tiny = jax.jit(lambda x: x + 1)
z = jnp.zeros((8,), jnp.float32)
leaf(tiny(z))
floors = []
for _ in range(8):
    t0 = time.perf_counter()
    leaf(tiny(z))
    floors.append(time.perf_counter() - t0)
RTT = sorted(floors)[4]
print(f"RTT+readback floor: {RTT * 1e3:.1f} ms", flush=True)


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    leaf(out)                       # warm + drain
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(N):
            out = fn(*args)
        leaf(out)
        wall = time.perf_counter() - t0
        per.append((wall - RTT) / N * 1e3)
    per.sort()
    print(f"{name:30s} {per[len(per)//2]:8.2f} ms/call  (min {per[0]:.2f})",
          flush=True)


@jax.jit
def duration(params, tokens, mask, style):
    return K.duration_raw(params, cfg, tokens, mask, style)


sums, hidden = duration(model.params, tokens_j, mask_j, style_pros)
timed("duration (token rate)", duration, model.params, tokens_j, mask_j,
      style_pros)
durations = jnp.clip(jnp.round(sums), 1.0, 50.0) * mask_j

from kokoro_stage_split import make_pre, make_tail  # noqa: E402

for F in (192, 320):
    pre = make_pre(model, F)
    tail = make_tail(model, F)
    args_pre = (model.params, tokens_j, mask_j, durations, hidden, style_gen,
                style_pros, key, model.window)
    cur, cur_mask, har_spec, total = pre(*args_pre)
    timed(f"pre-tail F={F} (frame rate)", pre, *args_pre)
    timed(f"generator tail F={F}", tail, model.params, cur, cur_mask,
          har_spec, style_gen, total, model.window)
# full fused for cross-check against the F-slope numbers
for F in (192, 320):
    fn = model._fused(F)
    args = (model.params, tokens_j, mask_j, style_gen, style_pros, key,
            model.window)
    fn(*args)
    timed(f"fused F={F}", fn, *args)
