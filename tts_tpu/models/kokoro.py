"""Kokoro-82M (StyleTTS2-family, non-autoregressive) — the flagship model.

Architecture parity with /root/reference/src/models/kokoro/model.cpp, redesigned
TPU-first:

  * two pure jitted functions instead of per-call graph rebuilds —
    `duration_forward` (ALBERT x12 recurrences -> prosody biLSTM stack ->
    per-token durations, model.cpp:938-1047) and `generation_forward`
    (alignment expansion -> F0/N branches -> text encoder -> AdaIN decoder ->
    iSTFTNet generator -> iSTFT, model.cpp:1141-1242);
  * LSTMs are `lax.scan`s (vs. 110k/570k-node unrolled graphs);
  * shapes are bucketed (tokens, frames) with masks so XLA compiles a handful
    of variants; masked LSTM/instance-norm keep padded runs numerically equal
    to exact-shape runs in the valid region;
  * the alignment (duration) matrix is built on device from the predicted
    durations via cumsum + broadcast compare (model.cpp:1265-1274 builds it on
    host per call).

Weight names follow the GGUF layout written by py-gguf's KokoroEncoder and
consumed by kokoro/model.cpp:414-696.
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass, field
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from tts_tpu.ops.basic import (
    ada_instance_norm, ada_layer_norm, instance_norm_time, layer_norm,
    leaky_relu, snake,
)
from tts_tpu.ops.conv import conv1d, conv_transpose1d, reflect_pad_front
from tts_tpu.ops.lstm import bilstm, pack_lstm_params
from tts_tpu.ops.resample import upsample_linear, upsample_nearest
from tts_tpu.ops.stft import hann_window, istft, stft, window_squared_sum
from tts_tpu.runtime.api import TTSError


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class KokoroConfig:
    # albert (kokoro/model.h:186-203 defaults; overridden by GGUF keys)
    max_context_length: int = 512
    vocab_size: int = 178
    hidden_size: int = 768
    n_attn_heads: int = 12
    n_layers: int = 1
    n_recurrence: int = 12
    duration_hidden_size: int = 512
    style_half_size: int = 128
    max_duration_per_token: int = 50
    # generator
    up_sampling_factor: int = 600
    upsample_scale: float = 300.0
    n_kernels: int = 3
    n_fft: int = 20
    hop: int = 5
    out_conv_padding: int = 3
    harmonic_num: int = 8
    sin_amp: float = 0.1
    noise_std: float = 0.003
    voice_threshold: float = 10.0
    sample_rate: int = 24000
    # per-block geometry (from GGUF keys)
    up_conv_strides: tuple = (10, 6)
    up_conv_paddings: tuple = (5, 3)
    noise_conv_strides: tuple = (6, 1)
    noise_conv_paddings: tuple = (3, 0)
    # res_blocks[i][j] -> (padding, dilation); 6 main blocks, 2 noise blocks
    res_block_geom: tuple = ()
    noise_res_geom: tuple = ()
    # tokens
    bos_token_id: int = 0
    eos_token_id: int = 0
    space_token_id: int = 16
    # frame-rate activation dtype ("bfloat16" for HBM-bound generation;
    # "float32" for numerical-parity testing)
    compute_dtype: str = "bfloat16"

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.n_attn_heads

    @staticmethod
    def from_gguf_kv(kv: dict) -> "KokoroConfig":
        g = lambda k, d: int(kv.get(k, d))
        n_ups = g("kokoro.decoder.generator.upsamples", 2)
        n_res = g("kokoro.decoder.generator.kernels", 3) * n_ups
        n_noise = n_ups
        res_geom = tuple(
            tuple((g(f"kokoro.decoder.generator.res_blocks.{i}.{j}.padding", 1),
                   g(f"kokoro.decoder.generator.res_blocks.{i}.{j}.dilation", 1))
                  for j in range(3))
            for i in range(n_res))
        noise_geom = tuple(
            tuple((g(f"kokoro.decoder.generator.noise_blocks.{i}.res_block.{j}.padding", 1),
                   g(f"kokoro.decoder.generator.noise_blocks.{i}.res_block.{j}.dilation", 1))
                  for j in range(3))
            for i in range(n_noise))
        n_fft = g("kokoro.decoder.generator.n_fft", 20)
        return KokoroConfig(
            max_context_length=g("kokoro.duration_predictor.albert.context_length", 512),
            vocab_size=g("kokoro.tokenizer.vocab_size", 178),
            hidden_size=g("kokoro.duration_predictor.albert.hidden_size", 768),
            n_attn_heads=g("kokoro.duration_predictor.albert.attn_heads", 12),
            n_layers=g("kokoro.duration_predictor.albert.layers", 1),
            n_recurrence=g("kokoro.duration_predictor.albert.recurrence", 12),
            duration_hidden_size=g("kokoro.duration_predictor.hidden_size", 512),
            up_sampling_factor=g("kokoro.decoder.generator.up_sampling_factor", 600),
            n_kernels=g("kokoro.decoder.generator.kernels", 3),
            n_fft=n_fft,
            hop=g("kokoro.decoder.generator.hop", 5),
            out_conv_padding=g("kokoro.decoder.generator.padding", 3),
            up_conv_strides=tuple(g(f"kokoro.decoder.generator.up_convs.{i}.stride", s)
                                  for i, s in zip(range(n_ups), (10, 6))),
            up_conv_paddings=tuple(g(f"kokoro.decoder.generator.up_convs.{i}.padding", p)
                                   for i, p in zip(range(n_ups), (5, 3))),
            noise_conv_strides=tuple(g(f"kokoro.decoder.generator.noise_blocks.{i}.stride", s)
                                     for i, s in zip(range(n_noise), (6, 1))),
            noise_conv_paddings=tuple(g(f"kokoro.decoder.generator.noise_blocks.{i}.padding", p)
                                      for i, p in zip(range(n_noise), (3, 0))),
            res_block_geom=res_geom,
            noise_res_geom=noise_geom,
        )


# ---------------------------------------------------------------------------
# Param loading (GGUF name map -> nested pytree)
# ---------------------------------------------------------------------------

def _ada_block(get, base: str) -> dict:
    """ADA residual conv block params (kokoro/model.cpp:528-578)."""
    blk = {
        "conv1_w": get(f"{base}.conv1_weight"), "conv1_b": get(f"{base}.conv1_bias"),
        "conv2_w": get(f"{base}.conv2_weight"), "conv2_b": get(f"{base}.conv2_bias"),
    }
    for n in ("norm1", "norm2"):
        for p in ("gamma", "beta"):
            blk[f"{n}_{p}_w"] = get(f"{base}.{n}_{p}_weight").T
            blk[f"{n}_{p}_b"] = get(f"{base}.{n}_{p}_bias")
    pool = get(f"{base}.pool_weight", optional=True)
    if pool is not None:
        blk["pool_w"] = pool
        blk["pool_b"] = get(f"{base}.pool_bias")
    sc = get(f"{base}.conv1x1_weight", optional=True)
    if sc is not None:
        blk["sc_w"] = sc.reshape(sc.shape[0], -1).T      # [in, out]
    return blk


def _gen_res_block(get, base: str) -> dict:
    """Generator AdaIN res block (3 conv pairs; kokoro/model.cpp:470-525)."""
    blk = {"convs1_w": [], "convs1_b": [], "convs2_w": [], "convs2_b": [],
           "alpha1": [], "alpha2": [], "g1_w": [], "g1_b": [], "b1_w": [], "b1_b": [],
           "g2_w": [], "g2_b": [], "b2_w": [], "b2_b": []}
    for j in range(3):
        blk["convs1_w"].append(get(f"{base}.{j}.convs1_weight"))
        blk["convs1_b"].append(get(f"{base}.{j}.convs1_bias"))
        blk["convs2_w"].append(get(f"{base}.{j}.convs2_weight"))
        blk["convs2_b"].append(get(f"{base}.{j}.convs2_bias"))
        blk["alpha1"].append(get(f"{base}.{j}.alpha1").reshape(-1))
        blk["alpha2"].append(get(f"{base}.{j}.alpha2").reshape(-1))
        blk["g1_w"].append(get(f"{base}.{j}.gamma1_weight").T)
        blk["g1_b"].append(get(f"{base}.{j}.gamma1_bias"))
        blk["b1_w"].append(get(f"{base}.{j}.beta1_weight").T)
        blk["b1_b"].append(get(f"{base}.{j}.beta1_bias"))
        blk["g2_w"].append(get(f"{base}.{j}.gamma2_weight").T)
        blk["g2_b"].append(get(f"{base}.{j}.gamma2_bias"))
        blk["b2_w"].append(get(f"{base}.{j}.beta2_weight").T)
        blk["b2_b"].append(get(f"{base}.{j}.beta2_bias"))
    return blk


def _lstm_params(tensors: dict, prefix: str) -> dict:
    return {
        "fwd": pack_lstm_params(tensors, f"{prefix}.0"),
        "bwd": pack_lstm_params(tensors, f"{prefix}.0", reverse=True),
    }


def load_kokoro_params(tensors: dict, kv: dict, cfg: KokoroConfig) -> dict:
    """tensors: name -> numpy array (GGUF names, 'kokoro.' prefix included)."""

    def get(name, optional: bool = False):
        t = tensors.get(name)
        if t is None:
            if optional:
                return None
            raise KeyError(f"kokoro: missing tensor {name}")
        return jnp.asarray(np.asarray(t, dtype=np.float32))

    p: dict = {}
    a = "kokoro.albert"
    p["albert"] = {
        "token_embd": get(f"{a}.token_embd"),
        "position_embd": get(f"{a}.position_embd"),
        "token_type": get(f"{a}.token_type_embd"),
        "norm_w": get(f"{a}.norm"), "norm_b": get(f"{a}.norm_bias"),
        "embd_w": get(f"{a}.embd").T, "embd_b": get(f"{a}.embd_bias"),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        L = f"{a}.layer.{i}"
        p["albert"]["layers"].append({
            "q_w": get(f"{L}.q").T, "q_b": get(f"{L}.q_bias"),
            "k_w": get(f"{L}.k").T, "k_b": get(f"{L}.k_bias"),
            "v_w": get(f"{L}.v").T, "v_b": get(f"{L}.v_bias"),
            "o_w": get(f"{L}.o").T, "o_b": get(f"{L}.o_bias"),
            # GGUF "ffn_norm" = post-attention LN, "attn_norm" = post-FFN LN
            # (model.cpp:736-771 maps them this way)
            "post_attn_norm_w": get(f"{L}.ffn_norm"), "post_attn_norm_b": get(f"{L}.ffn_norm_bias"),
            "post_ffn_norm_w": get(f"{L}.attn_norm"), "post_ffn_norm_b": get(f"{L}.attn_norm_bias"),
            "ffn_w": get(f"{L}.ffn").T, "ffn_b": get(f"{L}.ffn_bias"),
            "ffn_out_w": get(f"{L}.ffn_out").T, "ffn_out_b": get(f"{L}.ffn_out_bias"),
        })

    d = "kokoro.duration_predictor"
    dp = {
        "encode_w": get(f"{d}.encode").T, "encode_b": get(f"{d}.encode_bias"),
        "duration_lstm": _lstm_params(tensors, f"{d}.duration_lstm"),
        "duration_proj_w": get(f"{d}.duration_proj").T,
        "duration_proj_b": get(f"{d}.duration_proj_bias"),
        "shared_lstm": _lstm_params(tensors, f"{d}.shared_lstm"),
        "f0_proj_w": get(f"{d}.f0_proj_kernel").reshape(-1),  # conv k=1 -> [C]
        "f0_proj_b": get(f"{d}.f0_proj_bias").reshape(()),
        "n_proj_w": get(f"{d}.n_proj_kernel").reshape(-1),
        "n_proj_b": get(f"{d}.n_proj_bias").reshape(()),
        "layers": [], "f0_blocks": [], "n_blocks": [],
    }
    i = 0
    while f"{d}.layers.{2 * i}.lstm.0.weights.0" in tensors:
        dp["layers"].append({
            "lstm": _lstm_params(tensors, f"{d}.layers.{2 * i}.lstm"),
            "gamma_w": get(f"{d}.layers.{2 * i + 1}.gamma_weight").T,
            "gamma_b": get(f"{d}.layers.{2 * i + 1}.gamma_bias"),
            "beta_w": get(f"{d}.layers.{2 * i + 1}.beta_weight").T,
            "beta_b": get(f"{d}.layers.{2 * i + 1}.beta_bias"),
        })
        i += 1
    i = 0
    while f"{d}.f0_blocks.{i}.conv1_weight" in tensors:
        dp["f0_blocks"].append(_ada_block(get, f"{d}.f0_blocks.{i}"))
        dp["n_blocks"].append(_ada_block(get, f"{d}.n_blocks.{i}"))
        i += 1
    p["dp"] = dp

    t = "kokoro.text_encoder"
    te = {"embd": get(f"{t}.embedding_weight"),
          "lstm": _lstm_params(tensors, f"{t}.lstm"), "convs": []}
    i = 0
    while f"{t}.layers.{i}.weight" in tensors:
        te["convs"].append({
            "w": get(f"{t}.layers.{i}.weight"), "b": get(f"{t}.layers.{i}.bias"),
            "gamma": get(f"{t}.layers.{i}.gamma"), "beta": get(f"{t}.layers.{i}.beta"),
        })
        i += 1
    p["text_encoder"] = te

    dec = "kokoro.decoder"
    asr_w = get(f"{dec}.asr_conv_weight")
    decoder = {
        "f0_conv_w": get(f"{dec}.f0_conv_weight"), "f0_conv_b": get(f"{dec}.f0_conv_bias"),
        "n_conv_w": get(f"{dec}.n_conv_weight"), "n_conv_b": get(f"{dec}.n_conv_bias"),
        "asr_w": asr_w.reshape(asr_w.shape[0], -1).T, "asr_b": get(f"{dec}.asr_conv_bias"),
        "encoder_block": _ada_block(get, f"{dec}.encoder_block"),
        "blocks": [],
    }
    i = 0
    while f"{dec}.decoder_blocks.{i}.conv1_weight" in tensors:
        decoder["blocks"].append(_ada_block(get, f"{dec}.decoder_blocks.{i}"))
        i += 1

    g = f"{dec}.generator"
    gen = {
        "m_source_w": get(f"{g}.m_source_weight").reshape(1, -1).T,
        "m_source_b": get(f"{g}.m_source_bias"),
        "out_conv_w": get(f"{g}.conv_post_weight"), "out_conv_b": get(f"{g}.conv_post_bias"),
        "ups": [], "noise_blocks": [], "res_blocks": [],
    }
    i = 0
    while f"{g}.ups.{i}.weight" in tensors:
        gen["ups"].append({"w": get(f"{g}.ups.{i}.weight"), "b": get(f"{g}.ups.{i}.bias")})
        i += 1
    i = 0
    while f"{g}.noise_blocks.{i}.conv_weight" in tensors:
        gen["noise_blocks"].append({
            "conv_w": get(f"{g}.noise_blocks.{i}.conv_weight"),
            "conv_b": get(f"{g}.noise_blocks.{i}.conv_bias"),
            "res": _gen_res_block(get, f"{g}.noise_blocks.{i}.resblock"),
        })
        i += 1
    i = 0
    while f"{g}.resblocks.{i}.0.convs1_weight" in tensors:
        gen["res_blocks"].append(_gen_res_block(get, f"{g}.resblocks.{i}"))
        i += 1
    decoder["generator"] = gen
    p["decoder"] = decoder

    p["voices"] = {}
    for name in list(kv.get("kokoro.voices", [])):
        tname = f"kokoro.voice_tensors.{name}"
        if tname in tensors:
            p["voices"][name] = get(tname)
    # fall back: pick up any voice tensors not listed in the KV array
    for name in tensors:
        if name.startswith("kokoro.voice_tensors."):
            vn = name[len("kokoro.voice_tensors."):]
            p["voices"].setdefault(vn, get(name))
    return p


# ---------------------------------------------------------------------------
# Forward graphs
# ---------------------------------------------------------------------------

def _albert_encode(albert, cfg: KokoroConfig, tokens, token_mask):
    """ALBERT encoder with n_recurrence passes of the shared layer
    (parity: kokoro/model.cpp:961-1008)."""
    T = tokens.shape[0]
    x = albert["token_embd"][tokens] + albert["position_embd"][:T] + albert["token_type"]
    x = layer_norm(x, eps=1e-12) * albert["norm_w"] + albert["norm_b"]
    x = x @ albert["embd_w"] + albert["embd_b"]

    neg = jnp.asarray(-1e9, x.dtype)
    attn_bias = jnp.where(token_mask[None, :] > 0, 0.0, neg)    # [1, T] keys
    scale = 1.0 / math.sqrt(cfg.head_size)

    for _ in range(cfg.n_recurrence):
        for L in albert["layers"]:
            q = (x @ L["q_w"] + L["q_b"]).reshape(T, cfg.n_attn_heads, cfg.head_size)
            k = (x @ L["k_w"] + L["k_b"]).reshape(T, cfg.n_attn_heads, cfg.head_size)
            v = (x @ L["v_w"] + L["v_b"]).reshape(T, cfg.n_attn_heads, cfg.head_size)
            logits = jnp.einsum("qhd,khd->hqk", q, k) * scale + attn_bias[None]
            w = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum("hqk,khd->qhd", w, v).reshape(T, cfg.hidden_size)
            attn = attn @ L["o_w"] + L["o_b"]
            x = attn + x
            x = layer_norm(x, eps=1e-12) * L["post_attn_norm_w"] + L["post_attn_norm_b"]
            h = jax.nn.gelu(x @ L["ffn_w"] + L["ffn_b"])
            h = h @ L["ffn_out_w"] + L["ffn_out_b"]
            x = h + x
            x = layer_norm(x, eps=1e-12) * L["post_ffn_norm_w"] + L["post_ffn_norm_b"]
    return x


def duration_raw(params, cfg: KokoroConfig, tokens, token_mask, style):
    """Differentiable core of duration prediction: returns (pre-round duration
    sums [T], hidden [T, 640]).  Used by inference (rounded/clamped below) and
    by the training step (parallel/training.py)."""
    dp = params["dp"]
    x = _albert_encode(params["albert"], cfg, tokens, token_mask)
    x = x @ dp["encode_w"] + dp["encode_b"]

    style_row = jnp.broadcast_to(style, (x.shape[0], style.shape[0]))
    x = jnp.concatenate([x, style_row], axis=-1)
    for layer in dp["layers"]:
        x = bilstm(x, layer["lstm"]["fwd"], layer["lstm"]["bwd"], mask=token_mask)
        gamma = style @ layer["gamma_w"] + layer["gamma_b"]
        beta = style @ layer["beta_w"] + layer["beta_b"]
        x = ada_layer_norm(x, gamma, beta)
        x = jnp.concatenate([x, style_row], axis=-1)

    hidden = x                                                   # [T, 640]
    y = bilstm(x, dp["duration_lstm"]["fwd"], dp["duration_lstm"]["bwd"], mask=token_mask)
    y = jax.nn.sigmoid(y @ dp["duration_proj_w"] + dp["duration_proj_b"])
    return jnp.sum(y, axis=-1), hidden


@partial(jax.jit, static_argnames=("cfg",))
def duration_forward(params, cfg: KokoroConfig, tokens, token_mask, style):
    """tokens [T] int32 (padded), token_mask [T], style [128] (second half of
    the voice row).  Returns (durations [T] float, hidden [T, 640])."""
    sums, hidden = duration_raw(params, cfg, tokens, token_mask, style)
    durations = jnp.clip(jnp.round(sums), 1.0, 50.0) * token_mask
    return durations, hidden


def _ada_res_block(x, blk, style, mask=None):
    """AdainResBlk1d (parity: kokoro/model.cpp:88-134).  x: [T, C]."""
    gamma1 = style @ blk["norm1_gamma_w"] + blk["norm1_gamma_b"]
    beta1 = style @ blk["norm1_beta_w"] + blk["norm1_beta_b"]
    cur = ada_instance_norm(x, gamma1, beta1, mask=mask)
    cur = leaky_relu(cur, 0.2)
    out_mask = mask
    if "pool_w" in blk:
        # depthwise transposed conv k=3 s=2 (time x2)
        cur = conv_transpose1d(cur, blk["pool_w"], blk["pool_b"], stride=2,
                               padding=1, output_padding=1, groups=cur.shape[1])
        out_mask = None if mask is None else upsample_nearest(mask, 2)
    cur = conv1d(cur, blk["conv1_w"], blk["conv1_b"], padding=1)
    gamma2 = style @ blk["norm2_gamma_w"] + blk["norm2_gamma_b"]
    beta2 = style @ blk["norm2_beta_w"] + blk["norm2_beta_b"]
    cur = ada_instance_norm(cur, gamma2, beta2, mask=out_mask)
    cur = leaky_relu(cur, 0.2)
    cur = conv1d(cur, blk["conv2_w"], blk["conv2_b"], padding=1)

    res = x
    if "sc_w" in blk:
        if "pool_w" in blk:
            res = upsample_nearest(res, 2, axis=0)
        res = res @ blk["sc_w"].astype(res.dtype)
    return (cur + res) / math.sqrt(2.0), out_mask


def _gen_res_block_apply(x, blk, style, geom, mask=None):
    """Generator AdaIN residual block (parity: kokoro/model.cpp:136-165).

    The pad-region is re-zeroed after every conv so that a padded-bucket run
    equals an exact-shape run (zeros beyond the true end are exactly what a
    'same' conv would pad with)."""
    mcol = None if mask is None else mask.astype(x.dtype)[:, None]
    inp = x
    for j in range(len(blk["convs1_w"])):
        padding, dilation = geom[j]
        gamma = style @ blk["g1_w"][j] + blk["g1_b"][j]
        beta = style @ blk["b1_w"][j] + blk["b1_b"][j]
        # `inp` keeps the zero-tail invariant (caller masks the level input;
        # every conv below is mask-multiplied), so both AdaINs take the
        # cheap zero_tail stats path; snake maps 0 -> 0 exactly, so no
        # re-mask is needed between AdaIN (which masks its output) and the
        # conv.  Measured per [23040,128] op (tools/kokoro_mrf_bisect.py):
        # masked AdaIN 0.046 ms -> zero_tail ~unmasked 0.020 ms.
        cur = ada_instance_norm(inp, gamma, beta, mask=mask, zero_tail=True)
        cur = snake(cur, blk["alpha1"][j])
        cur = conv1d(cur, blk["convs1_w"][j], blk["convs1_b"][j],
                     padding=padding, dilation=dilation)
        if mcol is not None:
            cur = cur * mcol
        gamma = style @ blk["g2_w"][j] + blk["g2_b"][j]
        beta = style @ blk["b2_w"][j] + blk["b2_b"][j]
        cur = ada_instance_norm(cur, gamma, beta, mask=mask, zero_tail=True)
        cur = snake(cur, blk["alpha2"][j])
        cur = conv1d(cur, blk["convs2_w"][j], blk["convs2_b"][j], padding=geom[0][0])
        if mcol is not None:
            cur = cur * mcol
        inp = inp + cur
    return inp


def _sine_source(cfg: KokoroConfig, f0, frame_mask, noise_key):
    """Harmonic source: cumsum-mod sine gen + voiced/unvoiced noise
    (parity: build_sin_gen, kokoro/model.cpp:173-193 + util.cpp:139-172)."""
    nh = cfg.harmonic_num + 1
    harmonics = (jnp.arange(1, nh + 1, dtype=jnp.float32) / cfg.sample_rate)
    rad = (f0[:, None] * harmonics[None, :]) % 1.0               # [F2, nh]
    phase = jnp.cumsum(rad, axis=0) * (cfg.upsample_scale * 2.0 * np.pi)
    phase = upsample_linear(phase, int(cfg.upsample_scale), axis=0)   # [S, nh]
    f0_up = upsample_nearest(f0, int(cfg.upsample_scale))             # [S]

    voiced = (f0_up > cfg.voice_threshold).astype(jnp.float32)[:, None]
    noise = jax.random.normal(noise_key, phase.shape, jnp.float32)
    amp = voiced * cfg.sin_amp
    noise_amp = voiced * cfg.noise_std + (1.0 - voiced) * (cfg.sin_amp / 3.0)
    return jnp.sin(phase) * amp + noise * noise_amp                    # [S, nh]


def _device_window_sq_sum(window, n_fft: int, hop: int, S: int, n_frames_out):
    """On-device window^2 overlap sum (keeps everything in one dispatch).

    `n_frames_out` = true samples // hop; the spectrum contributing to those
    samples has n_frames_out + 1 centered frames.  Samples beyond the true
    audio end normalize by 1."""
    half = n_fft // 2
    t = jnp.arange(S)[:, None]
    j = jnp.arange(n_fft)[None, :]
    pos = t + half - j                       # tap j of frame f lands at f*hop+j-half
    f = pos // hop
    contrib = ((pos % hop == 0) & (f >= 0) & (f <= n_frames_out)).astype(jnp.float32)
    w2 = jnp.square(window.astype(jnp.float32))[None, :]
    wss = jnp.sum(contrib * w2, axis=1)
    cutoff = n_frames_out * hop
    return jnp.where(jnp.arange(S) < cutoff, jnp.maximum(wss, 1e-6), 1.0)


# D2H transfer word size for the packed fused-graph output.  12-bit packing
# (3 bytes per 2 samples) cuts the F=192 payload 230 -> 173 KB with error
# <= peak/4094 (~-72 dBFS re the utterance peak, below audibility), but the
# interleaved same-session A/B (tools/kokoro_transfer_ab.py) measured NO wall
# win: 16-bit p50 40.2 ms vs 12-bit 41.6 ms, mins equal — the tunnel's D2H
# is not bandwidth-linear at ~200 KB payloads and the device-side bit-pack
# offsets the byte saving.  Default stays 16 (measured -> not adopted);
# TTS_TPU_TRANSFER_BITS=12 keeps the packed path available for genuinely
# bandwidth-starved links.
TRANSFER_BITS = int(os.environ.get("TTS_TPU_TRANSFER_BITS", "16"))

# FLAT_PARAMS (ship weights as ONE flat f32 buffer instead of ~590 pytree
# leaves) was DELETED in round 5 (measured -> deleted): its premise — a
# per-leaf RPC cost, estimated ~3 ms by tools/rpc_legs_probe.py — was
# contradicted by tools/arg_count_probe.py (755 args == 1 arg), and the
# on-TPU interleaved A/B (tools/README.md "kokoro_flat_ab") measured the
# flat path at p50 96.2 ms vs 44.3 ms for the plain pytree: the in-graph
# slice+reshape reconstruction costs far more device time than the
# nonexistent per-leaf dispatch cost it saved.


@partial(jax.jit, static_argnames=("cfg", "F", "bits"))
def kokoro_fused_forward(params, cfg: KokoroConfig, F: int, tokens, token_mask,
                         style_gen, style_pros, noise_key, window,
                         bits: int = 16):
    """Duration prediction + generation in ONE dispatch (the round-2 lever:
    the axon host<->TPU link costs 15-50 ms per dispatch, and the frame-bucket
    choice is the only host decision between the two graphs — so the host
    PREDICTS the bucket from a running frames-per-token ratio and re-dispatches
    only when the prediction was too small; see KokoroModel.synthesize).

    Returns ONE packed byte/int16 array: audio quantized against its own
    peak, then total_frames (int32) and the peak (f32) bitcast into the
    tail.  One buffer = one D2H transfer on the bandwidth-starved tunnel;
    `bits` picks 12-bit packed (uint8[S*3/2 + 8]) or 16-bit (int16[S + 4]);
    models snapshot TRANSFER_BITS at construction.  `KokoroModel.synthesize`
    unpacks."""
    sums, hidden = duration_raw(params, cfg, tokens, token_mask, style_pros)
    durations = jnp.clip(jnp.round(sums), 1.0, 50.0) * token_mask
    audio = _generation_body(params, cfg, F, tokens, token_mask, durations,
                             hidden, style_gen, style_pros, noise_key, window)
    peak = jnp.max(jnp.abs(audio)) + 1e-9
    total = jnp.sum(durations).astype(jnp.int32)
    if bits == 12:
        assert audio.shape[0] % 2 == 0
        q = jnp.clip(jnp.round(audio / peak * 2047.0),
                     -2047, 2047).astype(jnp.int32) + 2048      # [S] in [1,4095]
        v = q.reshape(-1, 2)
        b0 = v[:, 0] & 0xFF
        b1 = (v[:, 0] >> 8) | ((v[:, 1] & 0xF) << 4)
        b2 = v[:, 1] >> 4
        payload = jnp.stack([b0, b1, b2], axis=1).astype(jnp.uint8).reshape(-1)
        tail = jnp.concatenate([
            jax.lax.bitcast_convert_type(total[None], jnp.uint8).reshape(-1),
            jax.lax.bitcast_convert_type(
                peak.astype(jnp.float32)[None], jnp.uint8).reshape(-1)])
        return jnp.concatenate([payload, tail])
    pcm = jnp.round(audio / peak * 32767.0).astype(jnp.int16)
    total16 = jax.lax.bitcast_convert_type(total[None], jnp.int16).reshape(-1)
    peak16 = jax.lax.bitcast_convert_type(
        peak.astype(jnp.float32)[None], jnp.int16).reshape(-1)
    return jnp.concatenate([pcm, total16, peak16])


@partial(jax.jit, static_argnames=("cfg", "F"))
def generation_forward(params, cfg: KokoroConfig, F: int, tokens, token_mask,
                       durations, hidden, style_gen, style_pros, noise_key,
                       window):
    """The full Kokoro generation graph on padded buckets.

    tokens/token_mask [T]; durations [T] float (0 for padding); hidden [T, 640];
    style_gen/style_pros [128]; window [n_fft]; F = frame bucket (static).
    Returns audio [F * up_sampling_factor]; the caller slices the true length.
    """
    return _generation_body(params, cfg, F, tokens, token_mask, durations,
                            hidden, style_gen, style_pros, noise_key, window)


def _generation_body(params, cfg: KokoroConfig, F: int, tokens, token_mask,
                     durations, hidden, style_gen, style_pros, noise_key,
                     window):
    dp, dec = params["dp"], params["decoder"]
    S = F * cfg.up_sampling_factor
    F2 = 2 * F                                # post-upsample frame rate

    # alignment [F, T] from durations (device-side; model.cpp:1265-1274)
    ends = jnp.cumsum(durations)
    starts = ends - durations
    fidx = jnp.arange(F, dtype=jnp.float32)[:, None]
    align = ((fidx >= starts[None, :]) & (fidx < ends[None, :])).astype(jnp.float32)
    total = jnp.sum(durations)
    frame_mask = (fidx[:, 0] < total).astype(jnp.float32)         # [F]
    frame2_mask = upsample_nearest(frame_mask, 2)                 # [F2]

    # prosody branch
    x = align @ hidden                                            # [F, 640]
    x = bilstm(x, dp["shared_lstm"]["fwd"], dp["shared_lstm"]["bwd"], mask=frame_mask)

    cdtype = jnp.dtype(cfg.compute_dtype)  # frame-rate compute policy (HBM-bound)
    f0 = x.astype(cdtype)
    f0_mask = frame_mask
    for blk in dp["f0_blocks"]:
        f0, f0_mask = _ada_res_block(f0, blk, style_pros, mask=f0_mask)
    f0_curve = (f0.astype(jnp.float32) @ dp["f0_proj_w"] + dp["f0_proj_b"])  # [F2]

    n = x.astype(cdtype)
    n_mask = frame_mask
    for blk in dp["n_blocks"]:
        n, n_mask = _ada_res_block(n, blk, style_pros, mask=n_mask)
    n_curve = (n.astype(jnp.float32) @ dp["n_proj_w"] + dp["n_proj_b"])      # [F2]

    # text encoder branch
    te = params["text_encoder"]
    t = te["embd"][tokens]                                        # [T, 512]
    for conv in te["convs"]:
        t = conv1d(t, conv["w"], conv["b"], padding=2)
        t = layer_norm(t, eps=1e-5) * conv["gamma"] + conv["beta"]
        t = leaky_relu(t, 0.2)
        t = t * token_mask[:, None]
    t = bilstm(t, te["lstm"]["fwd"], te["lstm"]["bwd"], mask=token_mask)
    asr = align @ t                                               # [F, 512]

    # decoder (parity: model.cpp:1209-1232)
    f0_d = conv1d(f0_curve[:, None].astype(cdtype), dec["f0_conv_w"],
                  dec["f0_conv_b"], stride=2, padding=1)          # [F, 1]
    n_d = conv1d(n_curve[:, None].astype(cdtype), dec["n_conv_w"],
                 dec["n_conv_b"], stride=2, padding=1)
    asr16 = asr.astype(cdtype)
    cur = jnp.concatenate([asr16, f0_d, n_d], axis=-1)
    cur, cur_mask = _ada_res_block(cur, dec["encoder_block"], style_gen, mask=frame_mask)
    asr_res = asr16 @ dec["asr_w"].astype(cdtype) + dec["asr_b"].astype(cdtype)
    for blk in dec["blocks"]:
        cat = jnp.concatenate([cur, asr_res, f0_d, n_d], axis=-1)
        cur, cur_mask = _ada_res_block(cat, blk, style_gen, mask=cur_mask)
    # cur: [F2, C] after the last (upsampling) block

    # generator (parity: build_generator, model.cpp:195-244)
    gen = dec["generator"]
    source = _sine_source(cfg, f0_curve, frame2_mask, noise_key)  # [S, nh]
    har = jnp.tanh(source @ gen["m_source_w"] + gen["m_source_b"])[:, 0]   # [S]
    mag, phase = stft(har, window, cfg.n_fft, cfg.hop)            # [S/hop+1, bins]
    har_spec = jnp.concatenate([mag, phase], axis=-1).astype(cdtype)
    return generator_tail(gen, cfg, cur, cur_mask, har_spec, style_gen,
                          total, window, S)


def generator_tail(gen, cfg: KokoroConfig, cur, cur_mask, har_spec, style_gen,
                   total, window, S: int):
    """Upsample stack + noise blocks + iSTFT, from the decoder output `cur`
    [F2, C] and the harmonic spectrum `har_spec` [S/hop+1, 2*bins].

    Split out of `generation_forward` (it is traced inline there) so the
    numpy parity harness can compare it on a shared spectrum — the raw STFT
    phase feature has a +/-pi branch ambiguity that makes full-graph
    bit-comparisons meaningless across float implementations."""
    cdtype = jnp.dtype(cfg.compute_dtype)
    x = cur * cur_mask.astype(cdtype)[:, None]
    n_ups = len(gen["ups"])
    valid = 2 * total                     # valid frames at the current rate
    for i in range(n_ups):
        x = leaky_relu(x, 0.1)
        x = conv_transpose1d(x, gen["ups"][i]["w"], gen["ups"][i]["b"],
                             stride=cfg.up_conv_strides[i],
                             padding=cfg.up_conv_paddings[i])
        valid = valid * cfg.up_conv_strides[i]
        if i == n_ups - 1:
            x = reflect_pad_front(x, 1)
            valid = valid + 1
        m = (jnp.arange(x.shape[0]) < valid).astype(x.dtype)
        x = x * m[:, None]
        src = conv1d(har_spec, gen["noise_blocks"][i]["conv_w"],
                     gen["noise_blocks"][i]["conv_b"],
                     stride=cfg.noise_conv_strides[i],
                     padding=cfg.noise_conv_paddings[i])
        sm = (jnp.arange(src.shape[0]) < valid).astype(x.dtype)
        src = src * sm[:, None]
        src = _gen_res_block_apply(src, gen["noise_blocks"][i]["res"],
                                   style_gen, cfg.noise_res_geom[i], mask=sm)
        x = x + src
        acc = None
        for k in range(cfg.n_kernels):
            r = _gen_res_block_apply(x, gen["res_blocks"][i * cfg.n_kernels + k],
                                     style_gen, cfg.res_block_geom[i * cfg.n_kernels + k],
                                     mask=m)
            acc = r if acc is None else acc + r
        x = acc / float(cfg.n_kernels)

    x = leaky_relu(x, 0.01)
    x = conv1d(x, gen["out_conv_w"], gen["out_conv_b"],
               padding=cfg.out_conv_padding).astype(jnp.float32)
    n_bins = cfg.n_fft // 2 + 1
    fmask = (jnp.arange(x.shape[0]) < valid).astype(jnp.float32)[:, None]
    spec = jnp.exp(x[:, :n_bins]) * fmask
    ph = jnp.sin(x[:, n_bins:]) * fmask
    n_samples_true = (total * cfg.up_sampling_factor).astype(jnp.int32)
    wss = _device_window_sq_sum(window, cfg.n_fft, cfg.hop, S,
                                n_samples_true // cfg.hop)
    audio = istft(spec, ph, window, wss, cfg.n_fft, cfg.hop)      # [S]
    return audio


# ---------------------------------------------------------------------------
# Runner
# ---------------------------------------------------------------------------

TOKEN_BUCKETS = (64, 128, 256, 512)
# ~1.25x geometric steps: pad waste stays <25% while keeping the compile
# variant count bounded (persistent cache amortizes across runs).  The small
# leading buckets serve realistic single sentences (~100-200 frames) and the
# sub-chunked first streaming emission (TTFA); the 176/224 steps densify the
# ladder exactly where single Harvard-length sentences land (the 192->256
# jump cost 33% extra frame compute whenever a prediction landed a few
# frames past 192 — measured in BENCH_r04 warmup, buckets 192/256 both hot).
FRAME_BUCKETS = (64, 96, 128, 160, 176, 192, 224, 256, 320, 384, 448, 512,
                 640, 768, 1024, 1280, 1536, 2048, 2560, 3072, 4096, 5120,
                 6144, 8192, 10240, 12800, 16384, 20480, 25600)


def pick_bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class KokoroModel:
    """Device-facing model state: config + params + jit caches."""

    device_arrays = ("params", "window", "_voice_packs_dev")

    def __init__(self, cfg: KokoroConfig, params: dict):
        self.cfg = cfg
        self.params = params
        self.window = jnp.asarray(hann_window(cfg.n_fft))
        # snapshot the transfer policy flag at construction: the traced
        # graphs bake it in, so mutating the module global after build must
        # not desynchronize trace-time packing from host unpack
        self.transfer_bits = TRANSFER_BITS
        # running frames-per-token estimate for the fused-dispatch bucket
        # prediction, PER VOICE (speaking rate is a voice property; a shared
        # scalar cross-pollutes predictions and pays re-dispatches until the
        # EMA re-converges — VERDICT r3 item 5).  A voice absent from the dict
        # starts at `fpt_default` (GGUF KV `kokoro.frames_per_token` when the
        # converter measured one, else 8.0) and snaps to its first measurement.
        self._frames_per_token: dict[str, float] = {}
        self.fpt_default: float = 8.0
        # production p99 guard (VERDICT r3 item 1a): freeze_buckets() pins
        # frame-bucket selection to the set compiled during warmup so a
        # predictor shift after warmup can never trigger a post-warmup
        # compile/AOT-load on the serving path.  _bucket_events records every
        # first-use of a frame bucket in this process (bench warm-coverage
        # accounting).
        self._pinned_fbuckets: tuple | None = None
        self._pinned_tbuckets: tuple | None = None
        self._seen_tbuckets: set = set()
        self._bucket_events: list = []
        self._fused_jits: dict = {}
        self._fused_packed_jits: dict = {}
        self._aot_keys: dict = {}           # (F, Tb) -> AOT cache key
        self._voice_packs_dev: dict = {}
        # diagnostics: leg split of the most recent synthesize call (last-
        # writer-wins under the server's worker threads — attribution only)
        self.last_legs: dict = {}

    def _fused(self, F: int):
        """Per-bucket jit of the fused graph with statics closed over, so the
        AOT export cache can serialize it (runtime/aot.py)."""
        fn = self._fused_jits.get(F)
        if fn is None:
            cfg = self.cfg
            body = kokoro_fused_forward.__wrapped__

            bits = self.transfer_bits

            @jax.jit
            def fused(params, tokens, mask, style_gen, style_pros, key, window):
                return body(params, cfg, F, tokens, mask, style_gen,
                            style_pros, key, window, bits)

            self._fused_jits[F] = fn = fused
        return fn

    # subtrees the fused graph actually reads ("voices" is host/pack-side)
    _GRAPH_KEYS = ("albert", "dp", "decoder", "text_encoder")

    def _fused_packed(self, F: int):
        """_fused with the HOST PROTOCOL folded into the graph: ONE int32
        upload `arr = tokens_padded | T | seed` replaces the five per-call
        argument transfers (tokens, mask, two style rows, PRNGKey device
        computation) of the 5-arg form.  The mask (iota < T), the voice-style
        row (pack gather at clip(T-3), model.cpp:1013,1150) and the PRNG key
        (traced seed) are derived on device — token-rate ops, free next to
        the generation body — and the voice pack lives on device.  Under the
        axon tunnel every distinct transfer pays the per-dispatch latency
        floor (CLAUDE.md), so argument count is wall time."""
        fn = self._fused_packed_jits.get(F)
        if fn is None:
            self._bucket_events.append(F)
            cfg = self.cfg
            half = cfg.style_half_size
            body = kokoro_fused_forward.__wrapped__

            bits = self.transfer_bits

            def protocol(params, pack, arr, window):
                tokens = arr[:-2]
                t = arr[-2]
                mask = (jnp.arange(arr.shape[0] - 2) < t).astype(jnp.float32)
                row = pack[jnp.clip(t - 3, 0, pack.shape[0] - 1)]
                key = jax.random.PRNGKey(arr[-1].astype(jnp.uint32))
                return body(params, cfg, F, tokens, mask, row[:half],
                            row[half : 2 * half], key, window, bits)

            self._fused_packed_jits[F] = fn = jax.jit(protocol)
        return fn

    def freeze_buckets(self) -> tuple:
        """Pin frame-bucket selection to the buckets already compiled in this
        process.  After this, `synthesize` rounds its prediction UP to the
        nearest pinned bucket (a few % extra frame compute) instead of ever
        compiling a new one mid-serving; only a prediction LARGER than every
        pinned bucket falls back to the full ladder (and logs a bucket event).
        Returns the pinned set.  Call after warmup; call again after warming
        more buckets to extend the set.

        Token buckets are pinned too: a jitted fused graph retraces (and
        compiles) for each NEW arr shape, so a first post-warmup prompt
        longer than every warmed token bucket would otherwise be the same
        tail class at the Tb axis; after the freeze, prompt padding rounds
        up within the warmed Tbs (masked — identical output) and only a
        prompt beyond the largest falls back to the full ladder."""
        self._pinned_fbuckets = tuple(sorted(self._fused_packed_jits))
        self._pinned_tbuckets = tuple(sorted(self._seen_tbuckets))
        return self._pinned_fbuckets

    def seed_frame_rate(self, voice: str, frames_per_token: float) -> None:
        """Pre-seed the per-voice frame-rate predictor (serving warmup can
        calibrate each voice once and pin its first real request's bucket)."""
        self._frames_per_token[voice] = float(frames_per_token)

    def bucket_events(self) -> list:
        """Frame buckets first-used in this process, in order (bench warm-
        coverage accounting: events after freeze_buckets() are cold misses)."""
        return list(self._bucket_events)

    def _voice_pack(self, voice: str):
        """Device-resident voice pack (uploaded once per voice, not per call)."""
        pack = self._voice_packs_dev.get(voice)
        if pack is None:
            # land next to the (possibly replica-committed) weights, not the
            # default device — parallel/serving.move_to_device moves this
            # cache, but a voice first used AFTER the move must follow too
            dev = next(iter(self.window.devices()))
            self._voice_packs_dev[voice] = pack = jax.device_put(
                np.asarray(self.params["voices"][voice]), dev)
        return pack

    @classmethod
    def from_gguf(cls, gguf_file) -> "KokoroModel":
        import dataclasses

        cfg = KokoroConfig.from_gguf_kv(gguf_file.kv)
        tensors = {name: t.to_numpy() for name, t in gguf_file.tensors.items()}
        params = load_kokoro_params(tensors, gguf_file.kv, cfg)
        if params["voices"]:
            # the style vector width is defined by the voice packs (the
            # reference hardcodes 128 halves, kokoro/model.h:212)
            width = next(iter(params["voices"].values())).shape[1]
            if width // 2 != cfg.style_half_size:
                cfg = dataclasses.replace(cfg, style_half_size=width // 2)
        model = cls(cfg, params)
        # converter-measured speaking rate (optional KV): seeds the frame-
        # bucket predictor so the FIRST call per voice already lands in the
        # right bucket instead of starting from the conservative 8.0
        fpt = gguf_file.kv.get("kokoro.frames_per_token")
        if fpt is not None:
            model.fpt_default = float(fpt)
        return model

    def voice_style(self, voice: str, n_tokens: int):
        """Voice row indexed by token count (model.cpp:1013,1150: row T-3)."""
        pack = self.params["voices"][voice]
        row = pack[min(max(n_tokens - 3, 0), pack.shape[0] - 1)]
        half = self.cfg.style_half_size
        return row[:half], row[half : 2 * half]   # (decoder style, prosody style)

    def predict_durations(self, token_ids: list[int], voice: str):
        cfg = self.cfg
        T = len(token_ids)
        Tb = pick_bucket(T, TOKEN_BUCKETS)
        tokens = np.zeros(Tb, np.int32)
        tokens[:T] = token_ids
        mask = np.zeros(Tb, np.float32)
        mask[:T] = 1.0
        _, style_pros = self.voice_style(voice, T)
        durations, hidden = duration_forward(
            self.params, cfg, jnp.asarray(tokens), jnp.asarray(mask), style_pros)
        return tokens, mask, durations, hidden

    def _pick_frame_bucket(self, n_frames: int) -> int:
        """Frame bucket for `n_frames`: the pinned (warmed) ladder when one is
        set and it can hold the prediction, else the full ladder."""
        if self._pinned_fbuckets and n_frames <= self._pinned_fbuckets[-1]:
            return pick_bucket(n_frames, self._pinned_fbuckets)
        return pick_bucket(n_frames, FRAME_BUCKETS)

    def synthesize(self, token_ids: list[int], voice: str, seed: int = 0):
        """One chunk -> float32 PCM, in ONE device dispatch when the
        frame-bucket prediction holds (kokoro_fused_forward), falling back to
        a second dispatch at the correct bucket when it doesn't.

        Leg attribution (VERDICT r4 item 3): each call records
        `self.last_legs` = {host_pre_ms, dispatch_d2h_ms, unpack_ms,
        redispatched, F, payload_kb} — three perf_counter reads, no extra
        device work — so an outlier wall can be attributed to the host path
        vs the fused dispatch+D2H leg (which contains the tunnel floor)."""
        t_enter = time.perf_counter()
        cfg = self.cfg
        T = len(token_ids)
        if self._pinned_tbuckets and T <= self._pinned_tbuckets[-1]:
            Tb = pick_bucket(T, self._pinned_tbuckets)
        else:
            Tb = pick_bucket(T, TOKEN_BUCKETS)
        if Tb not in self._seen_tbuckets:
            self._seen_tbuckets.add(Tb)
            if self._pinned_tbuckets is not None:   # post-freeze cold trace
                self._bucket_events.append(("Tb", Tb))
        # ONE host->device upload: tokens | T | seed (mask, style row and
        # PRNG key are derived in-graph, see _fused_packed)
        arr = np.zeros(Tb + 2, np.int32)
        arr[:T] = token_ids
        arr[-2] = T
        arr[-1] = seed
        pack = self._voice_pack(voice)

        # predict the frame bucket with ~12% headroom; clamped to the model
        # cap.  Too-tight costs a rare second dispatch; too-loose wastes
        # compute on a bigger bucket every call.
        fpt = self._frames_per_token.get(voice, self.fpt_default)
        predicted = min(int(fpt * T * 1.12) + 4,
                        cfg.max_duration_per_token * T)
        F = self._pick_frame_bucket(predicted)

        def run(F):
            # AOT-export cache skips per-process trace+lower of this graph;
            # the cache KEY is memoized per (F, Tb) — computing it walks the
            # whole params pytree, ~2 ms of host time per call (measured)
            from tts_tpu.runtime import aot
            fn = self._fused_packed(F)
            # `arr` rides as a plain numpy array: an explicit jnp.asarray is
            # a separate transfer RPC over the tunnel (~1 ms p50 measured,
            # tools/kokoro_micro_ab.py); inline in the execute call it's free
            args = (self.params, pack, arr, self.window)
            # "fp=0" is the deleted FLAT_PARAMS flag's default, kept verbatim
            # so existing AOT-export artifacts stay valid (the graph itself
            # is unchanged by the deletion)
            static = f"F={F}|tb={self.transfer_bits}|fp=0|{cfg!r}"
            key = self._aot_keys.get((F, Tb))
            if key is None:
                key = aot.make_key("kokoro_fused_packed", static, args)
                self._aot_keys[(F, Tb)] = key
            t_disp = time.perf_counter()
            packed = np.asarray(aot.call_cached(
                "kokoro_fused_packed", static, fn, *args, key=key))
            legs["dispatch_d2h_ms"] += (time.perf_counter() - t_disp) * 1e3
            legs["payload_kb"] = packed.nbytes / 1024.0
            legs["F"] = F
            if self.transfer_bits == 12:
                # uint8[S*3/2 + 8]: 12-bit packed pairs, then int32 total +
                # f32 peak bitcast into the 8-byte tail
                total = int(packed[-8:-4].copy().view(np.int32)[0])
                peak = float(packed[-4:].copy().view(np.float32)[0])
                b = packed[:-8].reshape(-1, 3).astype(np.uint16)
                v0 = (b[:, 0] | ((b[:, 1] & 0xF) << 8)).astype(np.int32)
                v1 = ((b[:, 1] >> 4) | (b[:, 2] << 4)).astype(np.int32)
                q = np.empty(2 * v0.size, np.int32)
                q[0::2] = v0
                q[1::2] = v1
                return q - 2048, total, peak, 2047.0
            # .copy(): a sliced int16 view is only 4-byte aligned when F*up
            # is even — don't depend on the upsampling factor's parity
            total = int(packed[-4:-2].copy().view(np.int32)[0])
            peak = float(packed[-2:].copy().view(np.float32)[0])
            return packed[:-4], total, peak, 32767.0

        legs = {"dispatch_d2h_ms": 0.0, "redispatched": False}
        pcm, total, peak, denom = run(F)
        legs["host_pre_ms"] = ((time.perf_counter() - t_enter) * 1e3
                               - legs["dispatch_d2h_ms"])
        if total <= 0:
            self.last_legs = legs
            return np.zeros(0, np.float32)
        prev = self._frames_per_token.get(voice)
        self._frames_per_token[voice] = (
            total / T if prev is None                 # snap to first measurement
            else 0.7 * prev + 0.3 * (total / T))
        if total > F:
            # prediction too small: re-dispatch at the right bucket (rare)
            legs["redispatched"] = True
            F = self._pick_frame_bucket(total)
            pcm, total, peak, denom = run(F)
        # audio + total + peak arrive in ONE int16 transfer, unpacked
        # host-side; total can only exceed F if it exceeds the largest
        # bucket (clamped truncation)
        if total > F:
            import logging
            logging.getLogger("tts_tpu").warning(
                "kokoro: predicted %d frames exceeds the largest bucket (%d); "
                "audio truncated — split the input text into shorter chunks",
                total, F)
        t_unpack = time.perf_counter()
        n = min(total, F) * cfg.up_sampling_factor
        out = pcm[:n].astype(np.float32) * (peak / denom)
        legs["unpack_ms"] = (time.perf_counter() - t_unpack) * 1e3
        self.last_legs = legs
        return out
