"""Sub-stage split of the Kokoro generator tail at the serving buckets:
level-1 (ups x10 + noise + MRF at S/6), level-2 (ups x6 + noise + MRF at S),
out-conv + iSTFT.  Chained-dispatch timing (block_until_ready is unreliable
over the axon tunnel): N dispatches then one forced 1-element readback.

Run on the TPU host: PYTHONPATH=/root/repo:/root/.axon_site python
tools/kokoro_tail_split.py  [F=192,224 via env FBUCKETS]
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
from tts_tpu.ops.conv import conv1d, conv_transpose1d, reflect_pad_front
from tts_tpu.ops.stft import istft

path = os.environ.get("BENCH_KOKORO_GGUF", "/tmp/bench_kokoro_82m_cal26.gguf")
if not os.path.exists(path):
    write_kokoro_gguf(path, KokoroDims.kokoro_82m(), seed=0, duration_bias=-2.6)
with GGUFFile(path) as f:
    model = K.KokoroModel.from_gguf(f)
cfg = model.cfg

N = int(os.environ.get("N", "20"))


def leaf(out):
    x = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(x).ravel()[:1]


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
    leaf(out)
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(N):
            out = fn(*args)
        leaf(out)
        per.append((time.perf_counter() - t0 - RTT) / N * 1e3)
    per.sort()
    print(f"{name:34s} {per[len(per) // 2]:8.2f} ms/call  (min {per[0]:.2f})",
          flush=True)


def make_level(F: int, i: int):
    """One upsample level of generator_tail: leaky+convT, noise conv + noise
    res block, 3-kernel MRF."""
    gen_cfg = cfg

    @jax.jit
    def level(gen, x, har_spec, style_gen, total):
        valid_in = 2 * total
        for j in range(i):
            valid_in = valid_in * gen_cfg.up_conv_strides[j]
        n_ups = len(gen["ups"])
        x = K.leaky_relu(x, 0.1)
        x = conv_transpose1d(x, gen["ups"][i]["w"], gen["ups"][i]["b"],
                             stride=gen_cfg.up_conv_strides[i],
                             padding=gen_cfg.up_conv_paddings[i])
        valid = valid_in * gen_cfg.up_conv_strides[i]
        if i == n_ups - 1:
            x = reflect_pad_front(x, 1)
            valid = valid + 1
        m = (jnp.arange(x.shape[0]) < valid).astype(x.dtype)
        x = x * m[:, None]
        src = conv1d(har_spec, gen["noise_blocks"][i]["conv_w"],
                     gen["noise_blocks"][i]["conv_b"],
                     stride=gen_cfg.noise_conv_strides[i],
                     padding=gen_cfg.noise_conv_paddings[i])
        sm = (jnp.arange(src.shape[0]) < valid).astype(x.dtype)
        src = src * sm[:, None]
        src = K._gen_res_block_apply(src, gen["noise_blocks"][i]["res"],
                                     style_gen, gen_cfg.noise_res_geom[i],
                                     mask=sm)
        x = x + src
        acc = None
        for k in range(gen_cfg.n_kernels):
            r = K._gen_res_block_apply(
                x, gen["res_blocks"][i * gen_cfg.n_kernels + k], style_gen,
                gen_cfg.res_block_geom[i * gen_cfg.n_kernels + k], mask=m)
            acc = r if acc is None else acc + r
        return acc / float(gen_cfg.n_kernels)
    return level


def make_mrf_only(F: int, i: int):
    """JUST the 3-kernel MRF of level i (the res blocks, no ups/noise)."""
    gen_cfg = cfg

    @jax.jit
    def mrf(gen, x, m, style_gen):
        acc = None
        for k in range(gen_cfg.n_kernels):
            r = K._gen_res_block_apply(
                x, gen["res_blocks"][i * gen_cfg.n_kernels + k], style_gen,
                gen_cfg.res_block_geom[i * gen_cfg.n_kernels + k], mask=m)
            acc = r if acc is None else acc + r
        return acc / float(gen_cfg.n_kernels)
    return mrf


def make_out(F: int):
    S = F * cfg.up_sampling_factor

    @jax.jit
    def out(gen, x, total, window):
        x = K.leaky_relu(x, 0.01)
        x = conv1d(x, gen["out_conv_w"], gen["out_conv_b"],
                   padding=cfg.out_conv_padding).astype(jnp.float32)
        n_bins = cfg.n_fft // 2 + 1
        valid = total * cfg.up_sampling_factor + 1
        fmask = (jnp.arange(x.shape[0]) < valid).astype(jnp.float32)[:, None]
        spec = jnp.exp(x[:, :n_bins]) * fmask
        ph = jnp.sin(x[:, n_bins:]) * fmask
        n_samples_true = (total * cfg.up_sampling_factor).astype(jnp.int32)
        wss = K._device_window_sq_sum(window, cfg.n_fft, cfg.hop, S,
                                      n_samples_true // cfg.hop)
        return istft(spec, ph, window, wss, cfg.n_fft, cfg.hop)
    return out


gen = model.params["decoder"]["generator"]
cdtype = jnp.dtype(cfg.compute_dtype)
key = jax.random.PRNGKey(0)

for F in [int(x) for x in os.environ.get("FBUCKETS", "192,224").split(",")]:
    F2 = 2 * F
    S = F * cfg.up_sampling_factor
    total = jnp.asarray(float(F) - 8.0)           # nearly-full bucket
    # decoder output stand-in [F2, C_in of ups0] ([C_in, C_out, K] layout)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (F2, gen["ups"][0]["w"].shape[0])).astype(np.float32)).astype(cdtype)
    nb = cfg.n_fft // 2 + 1
    har_spec = jnp.asarray(np.random.default_rng(1).standard_normal(
        (S // cfg.hop + 1, 2 * nb)).astype(np.float32)).astype(cdtype)

    lvl0 = make_level(F, 0)
    lvl1 = make_level(F, 1)
    x1 = lvl0(gen, x0, har_spec, model.voice_style("af_heart", 30)[0], total)
    x2 = lvl1(gen, x1, har_spec, model.voice_style("af_heart", 30)[0], total)
    sg = model.voice_style("af_heart", 30)[0]
    print(f"-- F={F} (S={S}) x0{tuple(x0.shape)} x1{tuple(x1.shape)} "
          f"x2{tuple(x2.shape)}", flush=True)
    timed(f"level0 ups10+noise+MRF F={F}", lvl0, gen, x0, har_spec, sg, total)
    timed(f"level1 ups6+noise+MRF  F={F}", lvl1, gen, x1, har_spec, sg, total)
    m1 = (jnp.arange(x1.shape[0]) < 2 * total * 10).astype(x1.dtype)
    m2 = (jnp.arange(x2.shape[0]) < 2 * total * 60 + 1).astype(x2.dtype)
    timed(f"mrf-only level0 F={F}", make_mrf_only(F, 0), gen, x1, m1, sg)
    timed(f"mrf-only level1 F={F}", make_mrf_only(F, 1), gen, x2, m2, sg)
    timed(f"out-conv+iSTFT F={F}", make_out(F), gen, x2, total, model.window)
