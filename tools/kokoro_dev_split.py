"""TRUE device-time split of the Kokoro fused graph via the fori-loop
differential method (tools/kokoro_mrf_bisect.py): chain N applications of a
stage INSIDE one jit at two loop counts — the dispatch floor, per-dispatch
tunnel overhead, and readback all cancel in (wall(N_HI)-wall(N_LO))/dN.
The chained-dispatch method (kokoro_tail_split.py) inflates per-call times
by a non-constant per-dispatch tunnel cost; this one doesn't.

Stages at the serving bucket F (default 192):
  whole    — kokoro_fused_forward (duration + generation + pack)
  tail     — generator_tail (ups/noise/MRF levels + out conv + iSTFT)
  level0/1 — one upsample level each (ups + noise res + 3-kernel MRF)
  out+istft— final conv + spectrum + iSTFT
pre = whole - tail (ALBERT/duration/prosody/decoder/STFT at token/frame rate).

PYTHONPATH=/root/repo:/root/.axon_site python tools/kokoro_dev_split.py
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
from tts_tpu.ops.conv import conv1d, conv_transpose1d
from tts_tpu.ops.basic import leaky_relu
from tts_tpu.ops.stft import stft

path = os.environ.get("BENCH_KOKORO_GGUF", "/tmp/bench_kokoro_82m_cal26.gguf")
if not os.path.exists(path):
    write_kokoro_gguf(path, KokoroDims.kokoro_82m(), seed=0, duration_bias=-2.6)
with GGUFFile(path) as f:
    model = K.KokoroModel.from_gguf(f)
cfg = model.cfg

F = int(os.environ.get("F", "192"))
Tb = 64
token_ids = list(range(2, 36))
T = len(token_ids)
tokens = np.zeros(Tb, np.int32); tokens[:T] = token_ids
mask = np.zeros(Tb, np.float32); mask[:T] = 1.0
tokens_j, mask_j = jnp.asarray(tokens), jnp.asarray(mask)
style_gen, style_pros = model.voice_style("af_heart", T)
key = jax.random.PRNGKey(0)
N_LO, N_HI = int(os.environ.get("N_LO", "3")), int(os.environ.get("N_HI", "13"))
REPS = int(os.environ.get("REPS", "7"))


def bench(name, fn, x0, *args):
    """fn(x, *args) -> array; chained via a tiny acc feedback so XLA can't
    hoist the body out of the loop."""
    @jax.jit
    def chained(n, x0, *a):
        def body(i, acc):
            x = x0 + (acc * 1e-30).astype(x0.dtype)
            y = fn(x, *a)
            return acc + y.astype(jnp.float32).ravel()[0]

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    for n in (N_LO, N_HI):
        np.asarray(chained(n, x0, *args))

    def wall(n):
        per = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(chained(n, x0, *args))
            per.append(time.perf_counter() - t0)
        return min(per)

    per_op = (wall(N_HI) - wall(N_LO)) / (N_HI - N_LO) * 1e3
    print(f"{name:26s} {per_op:8.3f} ms", flush=True)
    return per_op


# ---- whole fused graph ------------------------------------------------------
# The full graph inside a fori_loop exceeds the axon remote-compile request
# size (HTTP 413) — and so does re-jitting a lambda that CLOSES OVER the
# params (closure constants embed all 82M weights in the compile request).
# Measure the model's own jitted entry (params as arguments) as
# single-dispatch wall minus the session floor (same-session floor, ~±1 ms).
tiny = jax.jit(lambda x: x + 1)
z = jnp.zeros((8,), jnp.float32)
np.asarray(tiny(z))


def fused(sg):
    return K.kokoro_fused_forward(model.params, cfg, F, tokens_j, mask_j,
                                  sg, style_pros, key, model.window)


np.asarray(fused(style_gen))


def p50(call, reps=15):
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        call()
        walls.append((time.perf_counter() - t0) * 1e3)
    walls.sort()
    return walls[len(walls) // 2]


floor = p50(lambda: np.asarray(tiny(z)))
w = p50(lambda: np.asarray(fused(style_gen))[:1]) - floor
print(f"session floor             {floor:8.3f} ms")
print(f"whole fused graph         {w:8.3f} ms   (wall - floor)", flush=True)

# ---- generator_tail and its sub-stages -------------------------------------
# Build real intermediate inputs once, any values (timing only).
gen = model.params["decoder"]["generator"]
cdtype = jnp.dtype(cfg.compute_dtype)
rng = np.random.default_rng(0)
F2 = 2 * F
up0, up1 = cfg.up_conv_strides
S = F * cfg.up_sampling_factor
total = jnp.asarray(float(F) * 0.9, jnp.float32)

cur = jnp.asarray(rng.standard_normal((F2, gen["ups"][0]["w"].shape[0]))
                  .astype(np.float32)).astype(cdtype)
cur_mask = jnp.asarray((np.arange(F2) < int(0.9 * F2)).astype(np.float32))
n_bins = cfg.n_fft // 2 + 1
har_spec = jnp.asarray(rng.standard_normal((S // cfg.hop + 1, 2 * n_bins))
                       .astype(np.float32)).astype(cdtype)


def tail(c, hs):
    return K.generator_tail(gen, cfg, c, cur_mask, hs, style_gen, total,
                            model.window, S)


t = bench("generator_tail", tail, cur, har_spec)
print(f"pre (whole - tail)        {w - t:8.3f} ms")


def make_level(i, Tin, Cin):
    x0 = jnp.asarray(rng.standard_normal((Tin, Cin)).astype(np.float32)).astype(cdtype)

    def level(x):
        valid = (total * 2 * (up0 if i == 1 else 1)).astype(jnp.int32) * \
                cfg.up_conv_strides[i]
        x = leaky_relu(x, 0.1)
        x = conv_transpose1d(x, gen["ups"][i]["w"], gen["ups"][i]["b"],
                             stride=cfg.up_conv_strides[i],
                             padding=cfg.up_conv_paddings[i])
        if i == len(gen["ups"]) - 1:
            x = K.reflect_pad_front(x, 1)
            valid = valid + 1
        m = (jnp.arange(x.shape[0]) < valid).astype(x.dtype)
        x = x * m[:, None]
        src = conv1d(har_spec, gen["noise_blocks"][i]["conv_w"],
                     gen["noise_blocks"][i]["conv_b"],
                     stride=cfg.noise_conv_strides[i],
                     padding=cfg.noise_conv_paddings[i])
        sm = (jnp.arange(src.shape[0]) < valid).astype(x.dtype)
        src = src * sm[:, None]
        src = K._gen_res_block_apply(src, gen["noise_blocks"][i]["res"],
                                     style_gen, cfg.noise_res_geom[i], mask=sm)
        x = x + src
        acc = None
        for k in range(cfg.n_kernels):
            r = K._gen_res_block_apply(
                x, gen["res_blocks"][i * cfg.n_kernels + k], style_gen,
                cfg.res_block_geom[i * cfg.n_kernels + k], mask=m)
            acc = r if acc is None else acc + r
        return acc / float(cfg.n_kernels)

    return level, x0


lv0, x0 = make_level(0, F2, gen["ups"][0]["w"].shape[0])
l0 = bench("level0 (ups+noise+MRF)", lv0, x0)
lv1, x1 = make_level(1, F2 * up0, gen["ups"][1]["w"].shape[0])
l1 = bench("level1 (ups+noise+MRF)", lv1, x1)
print(f"out+istft (tail-l0-l1)    {t - l0 - l1:8.3f} ms")
