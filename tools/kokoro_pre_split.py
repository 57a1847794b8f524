"""Sub-stage split of the Kokoro fused graph's PRE-generator portion (the
part measured as `pre = whole - tail` by kokoro_dev_split.py — 10.05 of the
12.2 ms device total after the snake/AdaIN round-4 cuts, so this is where
the RTF target lives now).

Same fori-loop differential method as kokoro_dev_split.py: dispatch floor,
tunnel overhead and readback cancel in (wall(N_HI)-wall(N_LO))/dN.  Stages:

  albert      — 12-recurrence ALBERT encoder at Tb (duration_raw's front)
  duration    — full duration_raw (albert + 3 AdaLN biLSTM layers + dur LSTM)
  prosody     — shared biLSTM + F0/N AdainResBlk branches + projections (F)
  textenc     — embd + 3 convs + biLSTM at Tb, plus the align matmul
  decoder     — encoder_block + asr_res + decoder AdainResBlks (F -> F2)
  sine+stft   — harmonic source + conv-STFT of the [S] source

PYTHONPATH=/root/repo:/root/.axon_site python tools/kokoro_pre_split.py
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
from tts_tpu.ops.basic import leaky_relu, layer_norm
from tts_tpu.ops.conv import conv1d
from tts_tpu.ops.lstm import bilstm
from tts_tpu.ops.stft import stft

path = os.environ.get("BENCH_KOKORO_GGUF", "/tmp/bench_kokoro_82m_cal26.gguf")
if not os.path.exists(path):
    write_kokoro_gguf(path, KokoroDims.kokoro_82m(), seed=0, duration_bias=-2.6)
with GGUFFile(path) as f:
    model = K.KokoroModel.from_gguf(f)
cfg = model.cfg
params = model.params
dp, dec, te = params["dp"], params["decoder"], params["text_encoder"]
cdtype = jnp.dtype(cfg.compute_dtype)

F = int(os.environ.get("F", "192"))
F2 = 2 * F
S = F * cfg.up_sampling_factor
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
rng = np.random.default_rng(0)


def bench(name, fn, x0, *args):
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
    print(f"{name:30s} {per_op:8.3f} ms", flush=True)
    return per_op


# ---- albert (perturb the int tokens; the tiny acc cast can't be hoisted) ---
a = bench("albert (12 rec)",
          lambda tk: K._albert_encode(params["albert"], cfg, tk, mask_j),
          tokens_j)

# ---- full duration_raw ------------------------------------------------------
d = bench("duration_raw (albert+LSTMs)",
          lambda st: K.duration_raw(params, cfg, tokens_j, mask_j, st)[1],
          style_pros)
print(f"{'  dur LSTM stack (d - albert)':30s} {d - a:8.3f} ms")

# ---- prosody: shared biLSTM + F0/N branches --------------------------------
x_pros = jnp.asarray(rng.standard_normal((F, 640)).astype(np.float32))
frame_mask = jnp.asarray((np.arange(F) < int(0.9 * F)).astype(np.float32))


def prosody(x):
    x = bilstm(x, dp["shared_lstm"]["fwd"], dp["shared_lstm"]["bwd"],
               mask=frame_mask)
    f0 = x.astype(cdtype)
    f0_mask = frame_mask
    for blk in dp["f0_blocks"]:
        f0, f0_mask = K._ada_res_block(f0, blk, style_pros, mask=f0_mask)
    f0_curve = f0.astype(jnp.float32) @ dp["f0_proj_w"] + dp["f0_proj_b"]
    n = x.astype(cdtype)
    n_mask = frame_mask
    for blk in dp["n_blocks"]:
        n, n_mask = K._ada_res_block(n, blk, style_pros, mask=n_mask)
    n_curve = n.astype(jnp.float32) @ dp["n_proj_w"] + dp["n_proj_b"]
    return f0_curve + n_curve


p = bench("prosody (sharedLSTM+F0+N)", prosody, x_pros)

# ---- text encoder + align matmuls ------------------------------------------
align = jnp.asarray(rng.random((F, Tb)).astype(np.float32))


def textenc(tk):
    t = te["embd"][tk]
    for conv in te["convs"]:
        t = conv1d(t, conv["w"], conv["b"], padding=2)
        t = layer_norm(t, eps=1e-5) * conv["gamma"] + conv["beta"]
        t = leaky_relu(t, 0.2)
        t = t * mask_j[:, None]
    t = bilstm(t, te["lstm"]["fwd"], te["lstm"]["bwd"], mask=mask_j)
    return align @ t


tx = bench("textenc (+align matmul)", textenc, tokens_j)

# ---- decoder (encoder_block + asr_res + blocks) -----------------------------
asr0 = jnp.asarray(rng.standard_normal((F, te["embd"].shape[1])).astype(np.float32))
f0c = jnp.asarray(rng.standard_normal(F2).astype(np.float32))
n_c = jnp.asarray(rng.standard_normal(F2).astype(np.float32))


def decoder(asr):
    f0_d = conv1d(f0c[:, None].astype(cdtype), dec["f0_conv_w"],
                  dec["f0_conv_b"], stride=2, padding=1)
    n_d = conv1d(n_c[:, None].astype(cdtype), dec["n_conv_w"],
                 dec["n_conv_b"], stride=2, padding=1)
    asr16 = asr.astype(cdtype)
    cur = jnp.concatenate([asr16, f0_d, n_d], axis=-1)
    cur, cur_mask = K._ada_res_block(cur, dec["encoder_block"], style_gen,
                                     mask=frame_mask)
    asr_res = asr16 @ dec["asr_w"].astype(cdtype) + dec["asr_b"].astype(cdtype)
    for blk in dec["blocks"]:
        cat = jnp.concatenate([cur, asr_res, f0_d, n_d], axis=-1)
        cur, cur_mask = K._ada_res_block(cat, blk, style_gen, mask=cur_mask)
    return cur


dc = bench("decoder (enc+blocks)", decoder, asr0)

# ---- sine source + conv-STFT ------------------------------------------------
frame2_mask = jnp.asarray((np.arange(F2) < int(0.9 * F2)).astype(np.float32))
gen = dec["generator"]


def sine_stft(f0_curve):
    source = K._sine_source(cfg, f0_curve, frame2_mask, key)
    har = jnp.tanh(source @ gen["m_source_w"] + gen["m_source_b"])[:, 0]
    mag, phase = stft(har, model.window, cfg.n_fft, cfg.hop)
    return mag


ss = bench("sine source + stft", sine_stft, f0c)

print("-" * 44)
print(f"{'sum of stages':30s} {d + p + tx + dc + ss:8.3f} ms")
