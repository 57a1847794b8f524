"""Full wall-clock decomposition of one Kokoro synthesize call, all under
the SAME session floor (CLAUDE.md rule):

  floor        — 8-float jit round-trip (dispatch + tiny D2H)
  d2h(size)    — trivial graph returning int16[size]: D2H bandwidth curve
  fused F=192  — raw kokoro_fused_forward dispatch + full-buffer readback
  synthesize   — the production path (host predictor + unpack + slice)

fused - floor - d2h(230KB) ~= true device compute (cross-check vs the
fori-differential's ~3.5 ms from kokoro_pre_split/kokoro_dev_split).

PYTHONPATH=/root/repo:/root/.axon_site python tools/kokoro_wall_decomp.py
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
F = int(os.environ.get("F", "192"))
REPS = int(os.environ.get("REPS", "25"))

Tb = 64
token_ids = list(range(2, 36))
T = len(token_ids)
tokens = np.zeros(Tb, np.int32); tokens[:T] = token_ids
mask = np.zeros(Tb, np.float32); mask[:T] = 1.0
tokens_j, mask_j = jnp.asarray(tokens), jnp.asarray(mask)
style_gen, style_pros = model.voice_style("af_heart", T)
key = jax.random.PRNGKey(0)


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
floor = p50(lambda: np.asarray(tiny(z)))
print(f"floor (8 floats)       {floor:8.3f} ms", flush=True)

# D2H curve: trivial graph emitting int16[n]
d2h_ms = {}
for n in (1024, 65536, 115204, 230408, 460816):
    g = jax.jit(lambda x, n=n: jnp.broadcast_to(x.astype(jnp.int16), (n,)))
    np.asarray(g(z[:1]))
    w = p50(lambda g=g: np.asarray(g(z[:1])))
    d2h_ms[n] = w - floor
    kb = n * 2 / 1024
    mbps = kb / 1024 / max(w - floor, 1e-9) * 1e3
    print(f"d2h int16[{n:7d}]     {w:8.3f} ms  (-floor {w - floor:7.3f}, "
          f"{kb:7.1f} KB, ~{mbps:6.1f} MB/s)", flush=True)

# raw fused dispatch + full readback (production bucket F)
fused_w = None


def fused():
    out = K.kokoro_fused_forward(model.params, cfg, F, tokens_j, mask_j,
                                 style_gen, style_pros, key, model.window)
    return np.asarray(out)


fused()
fused_w = p50(fused)
n_out = F * cfg.up_sampling_factor + 4
print(f"fused F={F} dispatch    {fused_w:8.3f} ms  (-floor {fused_w - floor:7.3f}, "
      f"output int16[{n_out}])", flush=True)
approx = fused_w - floor - d2h_ms.get(115204, 0.0)
print(f"  => device compute ~  {approx:8.3f} ms  (minus floor & d2h)",
      flush=True)

# the production path
model.synthesize(token_ids, "af_heart")           # warm + predictor settle
model.synthesize(token_ids, "af_heart")
sy = p50(lambda: model.synthesize(token_ids, "af_heart"))
print(f"synthesize()           {sy:8.3f} ms  (host path on top: "
      f"{sy - fused_w:7.3f})", flush=True)
