"""Dia: encoder-decoder dialogue TTS with classifier-free guidance (batch 2).

Parity: /root/reference/src/models/dia/model.cpp — byte-level tokens with
[S1]/[S2] -> 0x01/0x02, encoder always run at the full 1024-char context with
a block mask (valid<->valid, pad<->pad), cond+uncond run together, NEOX RoPE
(theta 1e4) on self *and* cross attention queries/keys, GQA decoder self-attn
(16 q / 4 kv), unscaled softmax (Dia's convention), cfg merge
cond + scale*(cond-uncond) with ids > EOS masked, delay pattern
{0,8,9,10,11,12,13,14,15} with a 15-step EOS drain, and the delay un-weave
before DAC decode.

TPU design: the encoder is one jitted call; the decoder step is one jitted
call with batch dim 2 (CFG) and an unrepeated GQA KV cache.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from tts_tpu.codecs.dac import DACDecoder
from tts_tpu.ops.qmatmul import apply_linear as _lin
from tts_tpu.models.registry import register_loader
from tts_tpu.ops.sampling import init_state, sample_tokens
from tts_tpu.ops.spec import SPEC_K, spec_enabled as _spec_enabled
from tts_tpu.runtime.api import GenerationConfig, TTSError, TTSResponse, TTSRunner


@dataclass(frozen=True)
class DiaConfig:
    n_encoder_layers: int = 12
    n_decoder_layers: int = 18
    encoder_hidden_size: int = 1024
    decoder_hidden_size: int = 2048
    encoder_attn_heads: int = 16
    decoder_attn_heads: int = 16
    decoder_query_heads: int = 4      # GQA group count: kv_heads = heads/groups
    head_size: int = 128
    n_output_heads: int = 9
    output_vocab_size: int = 1028
    audio_vocab_size: int = 1024
    eos_token_id: int = 1024
    pad_token_id: int = 1025
    bos_token_id: int = 1026
    max_encoder_context_length: int = 1024
    max_generation_size: int = 3072
    max_delay: int = 15
    delay_pattern: tuple = (0, 8, 9, 10, 11, 12, 13, 14, 15)
    cfg_scale: float = 3.0
    # KV/cross cache storage: f32 for dense checkpoints (bit-exact with the
    # NumPy parity path); the loader switches to bfloat16 when the decoder
    # weights are quantized (cache noise << weight quantization noise, half
    # the per-step cache bytes)
    kv_dtype: str = "float32"

    @property
    def kv_heads(self) -> int:
        return self.decoder_attn_heads // self.decoder_query_heads

    @staticmethod
    def from_gguf_kv(kv: dict) -> "DiaConfig":
        g = lambda k, d: int(kv.get(k, d))
        return DiaConfig(
            n_encoder_layers=g("dia.encoder.layers", 12),
            n_decoder_layers=g("dia.decoder.layers", 18),
            encoder_hidden_size=g("dia.encoder.hidden_size", 1024),
            decoder_hidden_size=g("dia.decoder.hidden_size", 2048),
            encoder_attn_heads=g("dia.encoder.attn_heads", 16),
            decoder_attn_heads=g("dia.decoder.attn_heads", 16),
            decoder_query_heads=g("dia.decoder.query_heads", 4),
            head_size=g("dia.attn_head_size", 128),
            n_output_heads=g("dia.decoder.output_heads", 9),
            output_vocab_size=g("dia.decoder.output_vocab_size", 1028),
            audio_vocab_size=g("dia.decoder.audio_vocab_size", 1024),
            eos_token_id=g("dia.eos_token_id", 1024),
            pad_token_id=g("dia.pad_token_id", 1025),
            bos_token_id=g("dia.bos_token_id", 1026),
            max_encoder_context_length=g("dia.encoder.max_context_length", 1024),
            max_generation_size=g("dia.decoder.max_generation_size", 3072),
            max_delay=g("dia.max_delay", 15),
            cfg_scale=float(kv.get("dia.cfg_scale", 3.0)),
        )


def load_dia_params(tensors: dict, cfg: DiaConfig) -> dict:
    """Decoder linears keep GGUF Q8/Q5/Q4 weights int8/int4 on device (the
    per-step decode reads ~5 GB of f32 weights otherwise — the decode loop is
    weight-bandwidth-bound exactly like Orpheus; parity:
    /root/reference/src/models/dia/model.cpp decoder walk).  Dense (f32/f16)
    checkpoints load unchanged, so the NumPy parity harness still sees
    bit-identical math."""
    from tts_tpu.core.gguf import GGUFTensor
    from tts_tpu.ops.qmatmul import pack_linear

    def get(name):
        t = tensors.get(name)
        if t is None:
            raise KeyError(f"dia: missing tensor {name}")
        if isinstance(t, GGUFTensor):
            t = t.to_numpy()
        return jnp.asarray(np.asarray(t, np.float32))

    def lin(name):
        """Decoder linear: dense -> transposed f32 array (legacy layout);
        quantized -> {"wq"/"wq4", "scales"} dict (eligibility rules live in
        `ops.qmatmul.pack_linear`)."""
        t = tensors.get(name)
        if t is None:
            raise KeyError(f"dia: missing tensor {name}")
        packed = pack_linear(t)
        return packed if packed is not None else get(name).T

    enc = {"embedding": get("dia.encoder.embedding"),
           "norm": get("dia.encoder.norm"), "layers": []}
    for i in range(cfg.n_encoder_layers):
        L = f"dia.encoder.layers.{i}"
        enc["layers"].append({
            "q": get(f"{L}.q_proj").T, "k": get(f"{L}.k_proj").T,
            "v": get(f"{L}.v_proj").T, "o": get(f"{L}.o_proj").T,
            "sa_norm": get(f"{L}.pre_sa_norm"),
            "mlp_norm": get(f"{L}.post_sa_norm"),
            "gate": get(f"{L}.gate").T, "up": get(f"{L}.up").T,
            "wo": get(f"{L}.wo").T,
        })
    dec = {"norm": get("dia.decoder.norm"), "embds": [], "heads": [], "layers": []}
    for i in range(cfg.n_output_heads):
        dec["embds"].append(get(f"dia.decoder.embeddings.{i}"))
        dec["heads"].append(get(f"dia.decoder.heads.{i}").T)
    for i in range(cfg.n_decoder_layers):
        L = f"dia.decoder.layers.{i}"
        dec["layers"].append({
            "sa_q": lin(f"{L}.self_q_proj"), "sa_k": lin(f"{L}.self_k_proj"),
            "sa_v": lin(f"{L}.self_v_proj"), "sa_o": lin(f"{L}.self_o_proj"),
            "ca_q": lin(f"{L}.cross_q_proj"), "ca_k": lin(f"{L}.cross_k_proj"),
            "ca_v": lin(f"{L}.cross_v_proj"), "ca_o": lin(f"{L}.cross_o_proj"),
            "sa_norm": get(f"{L}.pre_sa_norm"),
            "ca_norm": get(f"{L}.pre_ca_norm"),
            "mlp_norm": get(f"{L}.pre_mlp_norm"),
            "gate": lin(f"{L}.gate"), "up": lin(f"{L}.up"),
            "wo": lin(f"{L}.wo"),
        })
    params = {"encoder": enc, "decoder": dec}
    if dia_params_quantized(params):
        # the 9 output heads read 75 MB of f32 per step; the reference keeps
        # them unquantized (quantize allowlist), but bf16 storage halves the
        # stream on already-quantized checkpoints (math stays f32 in the dot)
        dec["heads"] = [h.astype(jnp.bfloat16) for h in dec["heads"]]
    return params


def dia_params_quantized(params) -> bool:
    """True if any decoder linear kept its GGUF quantization on device (the
    loader then uses a bf16 KV/cross cache — the cache noise is far below the
    weight quantization noise, and it halves the per-step cache traffic)."""
    return any(isinstance(L[n], dict)
               for L in params["decoder"]["layers"]
               for n in ("sa_q", "gate"))


def _rms(x, w, eps: float = 1e-5):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps) * w


def _rope(x, positions, theta: float = 10000.0):
    """NEOX rope on [..., T, H, hs] with positions [T]."""
    hs = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, hs, 2, dtype=jnp.float32) / hs))
    ang = positions[:, None].astype(jnp.float32) * freqs[None, :]
    cos = jnp.cos(ang)[..., None, :]
    sin = jnp.sin(ang)[..., None, :]
    x1, x2 = x[..., : hs // 2], x[..., hs // 2 :]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


@partial(jax.jit, static_argnames=("cfg",))
def dia_encode(params, cfg: DiaConfig, tokens, n_valid):
    """tokens [2, Tmax] byte ids (row 0 = cond, row 1 = uncond/zeros) ->
    encoder states [2, Tmax, enc_hidden]."""
    enc = params["encoder"]
    B, T = tokens.shape
    x = enc["embedding"][tokens]
    positions = jnp.arange(T)
    valid = (positions < n_valid)
    # block mask: valid attends valid, pad attends pad (dia/model.cpp:727-736)
    block = (valid[:, None] == valid[None, :])
    mask = jnp.where(block, 0.0, -1e9)[None, None]       # [1, 1, T, T]

    H, hs = cfg.encoder_attn_heads, cfg.head_size
    for L in enc["layers"]:
        res = x
        h = _rms(x, L["sa_norm"])
        q = (h @ L["q"]).reshape(B, T, H, hs)
        k = (h @ L["k"]).reshape(B, T, H, hs)
        v = (h @ L["v"]).reshape(B, T, H, hs)
        q = _rope(q, positions)
        k = _rope(k, positions)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) + mask   # scale 1.0 (Dia)
        w = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, T, H * hs)
        x = res + attn @ L["o"]
        res = x
        h = _rms(x, L["mlp_norm"])
        x = res + (jax.nn.silu(h @ L["gate"]) * (h @ L["up"])) @ L["wo"]
    return _rms(x, enc["norm"])


@partial(jax.jit, static_argnames=("cfg",))
def dia_cross_kv(params, cfg: DiaConfig, enc_states, n_valid):
    """Precompute cross K (rope'd, zero beyond prompt) and V (full length)."""
    T = enc_states.shape[1]
    positions = jnp.arange(T)
    valid = (positions < n_valid).astype(enc_states.dtype)[None, :, None]
    H, hs = cfg.decoder_attn_heads, cfg.head_size
    dt = jnp.dtype(cfg.kv_dtype)
    ks, vs = [], []
    for L in params["decoder"]["layers"]:
        k = _lin(enc_states, L["ca_k"]).reshape(2, T, H, hs)
        k = _rope(k, positions) * valid[..., None]
        v = _lin(enc_states, L["ca_v"]).reshape(2, T, H, hs)
        ks.append(k.astype(dt))
        vs.append(v.astype(dt))
    return {"k": jnp.stack(ks), "v": jnp.stack(vs)}       # [L, 2, T, H, hs]


def init_dia_cache(cfg: DiaConfig) -> dict:
    shape = (cfg.n_decoder_layers, 2, cfg.max_generation_size, cfg.kv_heads,
             cfg.head_size)
    dt = jnp.dtype(cfg.kv_dtype)
    return {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}


def _dia_step(params, cfg, audio_tokens, pos, cache, cross_kv):
    """Shared single-step decoder body; returns (merged logits [9, V], cache)."""
    dec = params["decoder"]
    B = 2
    embds = jnp.stack(dec["embds"])
    x = jnp.sum(embds[jnp.arange(cfg.n_output_heads), audio_tokens], axis=0)
    x = jnp.broadcast_to(x, (B, 1, x.shape[-1]))
    positions = pos[None]
    Hq, Hkv, hs = cfg.decoder_attn_heads, cfg.kv_heads, cfg.head_size
    group = Hq // Hkv
    key_pos = jnp.arange(cfg.max_generation_size)
    self_mask = jnp.where(key_pos <= pos, 0.0, -1e9)[None, None, None, :]

    new_k, new_v = cache["k"], cache["v"]
    for l, L in enumerate(dec["layers"]):
        res = x
        h = _rms(x, L["sa_norm"])
        q = _lin(h, L["sa_q"]).reshape(B, 1, Hq, hs)
        k = _lin(h, L["sa_k"]).reshape(B, 1, Hkv, hs)
        v = _lin(h, L["sa_v"]).reshape(B, 1, Hkv, hs)
        q = _rope(q, positions)
        k = _rope(k, positions)
        # k/v are [B=2, T=1, Hkv, hs] == the (batch, position-slice) layout of
        # cache[l]; k[None] aligns axes (l, batch, pos, head, dim).  NOTE: a
        # round-1 transpose here wrote the uncond batch row into the cond
        # batch's NEXT POSITION, leaving batch 1's cache zero — found by the
        # numpy parity harness (tests/test_parity_numpy.py::test_dia_steps_parity).
        new_k = jax.lax.dynamic_update_slice(
            new_k, k[None].astype(new_k.dtype), (l, 0, pos, 0, 0))
        new_v = jax.lax.dynamic_update_slice(
            new_v, v[None].astype(new_v.dtype), (l, 0, pos, 0, 0))
        qg = q.reshape(B, 1, Hkv, group, hs)
        ck_all = new_k[l]                       # [B, P, Hkv, hs]
        cv_all = new_v[l]
        logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg,
                            ck_all.astype(jnp.float32)) + self_mask
        w = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhgqk,bkhd->bqhgd", w,
                          cv_all.astype(jnp.float32)).reshape(B, 1, Hq * hs)
        x = res + _lin(attn, L["sa_o"])

        res = x
        h = _rms(x, L["ca_norm"])
        q = _rope(_lin(h, L["ca_q"]).reshape(B, 1, Hq, hs), positions)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q,
                            cross_kv["k"][l].astype(jnp.float32))
        w = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w,
                          cross_kv["v"][l].astype(jnp.float32)).reshape(B, 1, Hq * hs)
        x = res + _lin(attn, L["ca_o"])

        res = x
        h = _rms(x, L["mlp_norm"])
        x = res + _lin(jax.nn.silu(_lin(h, L["gate"])) * _lin(h, L["up"]),
                       L["wo"])

    x = _rms(x, dec["norm"])
    heads = jnp.stack(dec["heads"])
    logits = jnp.einsum("bd,hdv->bhv", x[:, 0, :], heads)
    cond_l, uncond_l = logits[0], logits[1]
    merged = cond_l + cfg.cfg_scale * (cond_l - uncond_l)
    ids = jnp.arange(cfg.output_vocab_size)
    merged = jnp.where(ids[None, :] > cfg.eos_token_id, -jnp.inf, merged)
    return merged, {"k": new_k, "v": new_v}


def _dia_step_multi(params, cfg, in_mat, pos, cache, cross_kv):
    """T-position variant of _dia_step for the speculative verify forward:
    in_mat [T, 9] input token rows -> (merged CFG logits [T, 9, V], cache);
    writes KV at pos..pos+T-1.  The math per position is the T=1 body's —
    same einsum contractions over the same axes, batched over the new query
    axis — so greedy argmaxes match the sequential step bit-for-bit (locked
    by tests/test_dia.py)."""
    dec = params["decoder"]
    B = 2
    T = in_mat.shape[0]
    embds = jnp.stack(dec["embds"])
    x = jnp.sum(embds[jnp.arange(cfg.n_output_heads)[None, :], in_mat],
                axis=1)                                       # [T, hid]
    x = jnp.broadcast_to(x[None], (B, T, x.shape[-1]))
    positions = pos + jnp.arange(T)
    Hq, Hkv, hs = cfg.decoder_attn_heads, cfg.kv_heads, cfg.head_size
    group = Hq // Hkv
    key_pos = jnp.arange(cfg.max_generation_size)
    # [1, 1, 1, T, P] aligned to the "bhgqk" logits
    self_mask = jnp.where(key_pos[None, :] <= positions[:, None],
                          0.0, -1e9)[None, None, None, :, :]

    new_k, new_v = cache["k"], cache["v"]
    for l, L in enumerate(dec["layers"]):
        res = x
        h = _rms(x, L["sa_norm"])
        q = _lin(h, L["sa_q"]).reshape(B, T, Hq, hs)
        k = _lin(h, L["sa_k"]).reshape(B, T, Hkv, hs)
        v = _lin(h, L["sa_v"]).reshape(B, T, Hkv, hs)
        q = _rope(q, positions)
        k = _rope(k, positions)
        new_k = jax.lax.dynamic_update_slice(
            new_k, k[None].astype(new_k.dtype), (l, 0, pos, 0, 0))
        new_v = jax.lax.dynamic_update_slice(
            new_v, v[None].astype(new_v.dtype), (l, 0, pos, 0, 0))
        qg = q.reshape(B, T, Hkv, group, hs)
        logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg,
                            new_k[l].astype(jnp.float32)) + self_mask
        w = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhgqk,bkhd->bqhgd", w,
                          new_v[l].astype(jnp.float32)).reshape(B, T, Hq * hs)
        x = res + _lin(attn, L["sa_o"])

        res = x
        h = _rms(x, L["ca_norm"])
        q = _rope(_lin(h, L["ca_q"]).reshape(B, T, Hq, hs), positions)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q,
                            cross_kv["k"][l].astype(jnp.float32))
        w = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w,
                          cross_kv["v"][l].astype(jnp.float32)).reshape(
                              B, T, Hq * hs)
        x = res + _lin(attn, L["ca_o"])

        res = x
        h = _rms(x, L["mlp_norm"])
        x = res + _lin(jax.nn.silu(_lin(h, L["gate"])) * _lin(h, L["up"]),
                       L["wo"])

    x = _rms(x, dec["norm"])
    heads = jnp.stack(dec["heads"])
    logits = jnp.einsum("btd,hdv->bthv", x, heads)
    cond_l, uncond_l = logits[0], logits[1]
    merged = cond_l + cfg.cfg_scale * (cond_l - uncond_l)     # [T, 9, V]
    ids = jnp.arange(cfg.output_vocab_size)
    merged = jnp.where(ids[None, None, :] > cfg.eos_token_id, -jnp.inf, merged)
    return merged, {"k": new_k, "v": new_v}


@partial(jax.jit, static_argnames=("cfg",))
def dia_step0_logits(params, cfg: DiaConfig, cache, cross_kv):
    """CFG-merged per-head logits of decode step 0 (all-BOS frame at position
    0), consuming no loop/PRNG state — the parity-report probe that localizes
    a real-checkpoint mismatch to the encoder/decoder backbone vs the
    sampler/codec (VERDICT r3 item 4)."""
    tokens = jnp.full((cfg.n_output_heads,), cfg.bos_token_id, jnp.int32)
    merged, _ = _dia_step(params, cfg, tokens, jnp.asarray(0, jnp.int32),
                          cache, cross_kv)
    return merged


def dia_init_loop_state(cfg: DiaConfig):
    """Resumable decode carry: (next tokens, delay-drain counter, position) —
    lets generate_stream run the CFG loop in chunks."""
    return (jnp.full((cfg.n_output_heads,), cfg.bos_token_id, jnp.int32),
            jnp.asarray(-1, jnp.int32), jnp.asarray(0, jnp.int32))


@partial(jax.jit, static_argnames=("cfg", "top_k", "do_sample", "use_top_p"),
         donate_argnames=("cache",))
def dia_decode_loop(params, cfg: DiaConfig, limit, budget, cache, cross_kv,
                    key, sampler_state, loop_state, *, temperature=1.0,
                    top_k: int = 0, top_p=1.0, repetition_penalty=1.0,
                    do_sample: bool = True,
                        use_top_p: bool = True):
    """CFG decode with the EOS delay-drain in one dispatch (parity:
    generate_from_batch + check_stopping, dia/model.cpp:806-870).
    `budget` caps this dispatch's steps; `loop_state` (dia_init_loop_state or
    a previous chunk's return) resumes the drain/position state so chunked
    streaming decodes the same tokens as one full dispatch."""
    H = cfg.n_output_heads
    max_steps = cfg.max_generation_size
    delays = jnp.asarray(cfg.delay_pattern)
    head_idx = jnp.arange(H)
    out = jnp.full((max_steps, H), cfg.pad_token_id, jnp.int32)

    def cond(state):
        step, pos, tokens, delay, cache, key, sstate, out = state
        return (delay != 0) & (step < budget)

    def body(state):
        step, pos, tokens, delay, cache, key, sstate, out = state
        merged, cache = _dia_step(params, cfg, tokens, pos, cache, cross_kv)
        key, sub = jax.random.split(key)
        sampled, sstate = sample_tokens(
            sub, merged, sstate, temperature=temperature, top_k=top_k,
            top_p=top_p, repetition_penalty=repetition_penalty,
            do_sample=do_sample, use_top_p=use_top_p)
        out = out.at[step].set(sampled)
        pos = pos + 1
        nxt = jnp.where(pos > head_idx, sampled, cfg.bos_token_id).astype(jnp.int32)
        # stopping / drain for the NEXT step (check_stopping semantics)
        trigger = (delay == -1) & ((nxt[0] == cfg.eos_token_id)
                                   | (pos >= limit - cfg.max_delay))
        delay = jnp.where(trigger, cfg.max_delay, delay)
        step_after = cfg.max_delay - delay
        nxt = jnp.where(delay > 0,
                        jnp.where(step_after == delays, cfg.eos_token_id,
                                  jnp.where(step_after > delays, cfg.pad_token_id,
                                            nxt)),
                        nxt).astype(jnp.int32)
        delay = jnp.where(delay > 0, delay - 1, delay)
        return (step + 1, pos, nxt, delay, cache, key, sstate, out)

    tokens0, delay0, pos0 = loop_state
    init = (jnp.asarray(0, jnp.int32), pos0, tokens0, delay0, cache, key,
            sampler_state, out)
    step, pos, tokens, delay, cache, key, sstate, out = jax.lax.while_loop(
        cond, body, init)
    return out, step, cache, sstate, (tokens, delay, pos), key


def _drain_step(cfg: DiaConfig, delays, head_idx, row, pos_after, dcur, limit):
    """One step of the sequential body's next-input/drain evolution
    (dia_decode_loop body, parity: check_stopping dia/model.cpp:806-823):
    `row` is the step's sampled output, `pos_after` the position AFTER
    emitting it, `dcur` the drain counter before.  Returns (next input row,
    drain counter after)."""
    nxt = jnp.where(pos_after > head_idx, row, cfg.bos_token_id).astype(jnp.int32)
    trigger = (dcur == -1) & ((nxt[0] == cfg.eos_token_id)
                              | (pos_after >= limit - cfg.max_delay))
    dcur = jnp.where(trigger, cfg.max_delay, dcur)
    step_after = cfg.max_delay - dcur
    nxt = jnp.where(dcur > 0,
                    jnp.where(step_after == delays, cfg.eos_token_id,
                              jnp.where(step_after > delays, cfg.pad_token_id,
                                        nxt)),
                    nxt).astype(jnp.int32)
    dcur = jnp.where(dcur > 0, dcur - 1, dcur)
    return nxt, dcur


@partial(jax.jit, static_argnames=("cfg", "k", "force_miss"),
         donate_argnames=("cache", "out_init"))
def dia_decode_loop_spec_resume(params, cfg: DiaConfig, limit, budget_end,
                                cache, cross_kv, loop_state, out_init, *,
                                k: int = 7, force_miss: bool = False):
    """Resumable GREEDY speculative CFG decode (VERDICT r4 item 5): drafts k
    step-rows by prompt lookup over the emitted rows, replays the sequential
    loop's next-input/drain evolution along the draft path to build the k+1
    verify inputs, runs ONE batch-2 CFG forward over them
    (_dia_step_multi), and accepts the longest prefix where all 9 argmaxes
    agree.  After the forward the TRUE evolution is recomputed from the
    model's own outputs g (not the drafts), so the emitted rows, the drain
    schedule, and the stop point are BIT-IDENTICAL to dia_decode_loop with
    do_sample=False (locked by tests/test_dia.py).

    `loop_state` is the sequential (tokens, delay, pos) carry; `out_init`
    [max_generation_size + k + 1, 9] carries ALL emitted rows (global,
    indexed by pos) so the drafter keeps history across streaming chunks;
    `budget_end` is the GLOBAL pos bound for this dispatch; `limit` the
    drain-triggering token cap, as in dia_decode_loop.
    Returns (out, loop_state, cache)."""
    from tts_tpu.ops.spec import ngram_draft_rows as _ngram_draft_rows

    H = cfg.n_output_heads
    delays = jnp.asarray(cfg.delay_pattern)
    head_idx = jnp.arange(H)

    def cond(state):
        (tokens, delay, pos), cache, out = state
        return (delay != 0) & (pos < budget_end)

    def body(state):
        (tokens, delay, pos), cache, out = state
        if force_miss:
            drafts = jnp.full((k, H), -1, jnp.int32)
        else:
            drafts = _ngram_draft_rows(out, pos, k)

        # verify inputs: replay the drain evolution along the draft path
        ins = [tokens]
        dcur = delay
        for j in range(1, k + 1):
            nxt, dcur = _drain_step(cfg, delays, head_idx, drafts[j - 1],
                                    pos + j, dcur, limit)
            ins.append(nxt)
        in_mat = jnp.stack(ins)                                 # [k+1, H]

        merged, cache = _dia_step_multi(params, cfg, in_mat, pos, cache,
                                        cross_kv)               # [k+1, H, V]
        g = jnp.argmax(merged, axis=-1).astype(jnp.int32)

        agree = jnp.cumprod(jnp.where(jnp.all(drafts == g[:-1], axis=1), 1, 0))
        n_acc = jnp.sum(agree).astype(jnp.int32)

        # true post-emission evolution from the model's own outputs
        nxts, dafter = [], []
        dcur = delay
        for j in range(k + 1):
            nxt, dcur = _drain_step(cfg, delays, head_idx, g[j],
                                    pos + j + 1, dcur, limit)
            nxts.append(nxt)
            dafter.append(dcur)
        nxt_mat = jnp.stack(nxts)                               # [k+1, H]
        delay_vec = jnp.stack(dafter)                           # [k+1]

        # the sequential cond stops AFTER the row that zeroes the drain
        within = jnp.arange(k + 1, dtype=jnp.int32) <= n_acc
        done_vec = delay_vec == 0
        done_any = jnp.any(done_vec & within)
        first_done = jnp.argmax(
            jnp.where(within, done_vec, False)).astype(jnp.int32)
        n_emit = jnp.where(done_any, first_done + 1, n_acc + 1)
        n_emit = jnp.minimum(n_emit, budget_end - pos)

        emit_buf = jnp.where(jnp.arange(k + 1)[:, None] < n_emit, g,
                             cfg.pad_token_id)
        out = jax.lax.dynamic_update_slice(out, emit_buf, (pos, 0))
        idx = jnp.maximum(n_emit - 1, 0)
        return ((nxt_mat[idx], delay_vec[idx], pos + n_emit), cache, out)

    init = (loop_state, cache, out_init)
    loop_state, cache, out = jax.lax.while_loop(cond, body, init)
    return out, loop_state, cache


def tokenize_dia_sentence(text: str, cfg: DiaConfig) -> list[int]:
    """Byte-level tokens with [S1]/[S2] -> 0x01/0x02
    (parity: dia/model.cpp:639-685)."""
    text = text.strip()
    if not text.startswith("[S1]") and not text.startswith("[S2]"):
        text = "[S1] " + text
    if not text.endswith("."):
        text = text + "."
    text = text.replace("[S1]", "\x01").replace("[S2]", "\x02")
    data = text.encode("utf-8")
    if len(data) > cfg.max_encoder_context_length:
        raise TTSError(
            f"Dia currently only supports a max of {cfg.max_encoder_context_length} "
            f"characters and received an input of {len(data)} characters.")
    return list(data)


def adjust_output_tokens(output: np.ndarray, cfg: DiaConfig) -> np.ndarray:
    """Delay-pattern un-weave + invalid filter (parity: dia/model.cpp:825-847)."""
    steps = len(output)
    frames = []
    delays = np.asarray(cfg.delay_pattern)
    for i in range(max(steps - cfg.max_delay, 0)):
        idx = i + delays
        if idx[-1] >= steps:
            break
        row = output[idx, np.arange(cfg.n_output_heads)]
        if (row < cfg.audio_vocab_size).all():
            frames.append(row)
    if not frames:
        return np.zeros((0, cfg.n_output_heads), np.int32)
    return np.stack(frames).astype(np.int32)


class DiaRunner(TTSRunner):
    sample_rate = 44100
    architecture = "dia"
    device_arrays = ("params", "_cache")
    device_components = ("dac",)

    def __init__(self, cfg: DiaConfig, params: dict, dac: DACDecoder,
                 config: GenerationConfig):
        self.cfg = cfg
        self.params = params
        self.dac = dac
        self._cache = None

    def _encode(self, text: str, config: GenerationConfig):
        """Tokenize + encoder + cross-KV + fresh cache + sampler init."""
        cfg = self.cfg
        if config.max_tokens and config.max_tokens <= cfg.max_delay:
            raise TTSError(f"max_tokens must exceed the delay window ({cfg.max_delay})")
        ids = tokenize_dia_sentence(text, cfg)
        tokens = np.zeros((2, cfg.max_encoder_context_length), np.int32)
        tokens[0, : len(ids)] = ids
        enc_states = dia_encode(self.params, cfg, jnp.asarray(tokens),
                                jnp.asarray(len(ids), jnp.int32))
        cross = dia_cross_kv(self.params, cfg, enc_states,
                             jnp.asarray(len(ids), jnp.int32))
        if self._cache is None:
            self._cache = init_dia_cache(cfg)
        cache = jax.tree_util.tree_map(lambda x: x * 0, self._cache)
        key = jax.random.PRNGKey(config.seed if config.seed is not None else
                                 np.random.randint(0, 2**31 - 1))
        return cross, cache, key, init_state(cfg.n_output_heads)

    def generate_stream(self, text: str, config: GenerationConfig | None = None,
                        chunk_steps: int = 48):
        """Yield audio incrementally: the CFG loop runs in `chunk_steps`
        slices (resumable drain state) and the DAC decodes bounded windows,
        emission held RECEPTIVE_FRAMES behind the un-weaved frame head —
        the concatenated stream equals generate()'s audio."""
        config = config or GenerationConfig()
        cfg = self.cfg
        max_gen = config.max_tokens or cfg.max_generation_size
        cross, cache, key, sampler_state = self._encode(text, config)
        loop_state = dia_init_loop_state(cfg)
        outputs = np.zeros((0, cfg.n_output_heads), np.int32)
        emitted = 0
        done = False
        # greedy streaming rides the speculative loop chunk-by-chunk (the
        # carried out-buffer keeps the drafter's history across chunks);
        # emitted rows are bit-identical to the sequential loop AND to
        # generate().  Sampled streaming stays sequential (PRNG contract).
        spec = _spec_enabled(config)
        out_buf = (jnp.full((cfg.max_generation_size + SPEC_K + 1,
                             cfg.n_output_heads), cfg.pad_token_id, jnp.int32)
                   if spec else None)
        while not done and len(outputs) < max_gen:
            budget = min(chunk_steps, cfg.max_generation_size - len(outputs))
            i_cum = len(outputs)
            if spec:
                out_buf, loop_state, cache = dia_decode_loop_spec_resume(
                    self.params, cfg, jnp.asarray(max_gen, jnp.int32),
                    jnp.asarray(i_cum + budget, jnp.int32), cache, cross,
                    loop_state, out_buf, k=SPEC_K)
                n = int(loop_state[2]) - i_cum
                out_tokens = np.asarray(out_buf)[i_cum:]
            else:
                out_tokens, n_steps, cache, sampler_state, loop_state, key = \
                    dia_decode_loop(
                        self.params, cfg, jnp.asarray(max_gen, jnp.int32),
                        jnp.asarray(budget, jnp.int32), cache, cross, key,
                        sampler_state, loop_state, temperature=config.temperature,
                        top_k=config.top_k, top_p=config.top_p,
                        repetition_penalty=config.repetition_penalty,
                        do_sample=config.sample, use_top_p=config.top_p < 1.0)
                n = int(n_steps)
                out_tokens = np.asarray(out_tokens)
            done = int(loop_state[1]) == 0        # drain finished
            outputs = np.concatenate([outputs, out_tokens[:n]])
            frames = adjust_output_tokens(outputs, cfg)
            target = (len(frames) if done or len(outputs) >= max_gen
                      else len(frames) - self.dac.RECEPTIVE_FRAMES)
            if target > emitted:
                audio = self.dac.decode_window(frames, emitted, target)
                emitted = target
                if len(audio):
                    yield audio
        self._cache = cache

    def generate(self, text: str, config: GenerationConfig | None = None) -> TTSResponse:
        import time

        config = config or GenerationConfig()
        cfg = self.cfg
        max_gen = config.max_tokens or cfg.max_generation_size

        t0 = time.perf_counter()
        cross, cache, key, sampler_state = self._encode(text, config)
        t_encode = time.perf_counter()

        # parity-report stage capture: probe step-0 logits BEFORE the loop
        # donates the cache (debug path only — one extra dispatch)
        trace = {} if getattr(self, "capture_trace", False) else None
        if trace is not None:
            from tts_tpu.utils.trace import multihead_logit_stats
            ids = tokenize_dia_sentence(text, cfg)
            trace["prompt_ids"] = [int(i) for i in ids[:24]]
            trace["n_prompt_tokens"] = len(ids)
            trace["step0_logits"] = multihead_logit_stats(np.asarray(
                dia_step0_logits(self.params, cfg, cache, cross), np.float32))

        # one dispatch: CFG decode + delay-drain run on device; greedy calls
        # take the speculative loop (bit-identical tokens, see
        # dia_decode_loop_spec_resume)
        if _spec_enabled(config):
            out0 = jnp.full((cfg.max_generation_size + SPEC_K + 1,
                             cfg.n_output_heads), cfg.pad_token_id, jnp.int32)
            out_tokens, lstate, cache = dia_decode_loop_spec_resume(
                self.params, cfg, jnp.asarray(max_gen, jnp.int32),
                jnp.asarray(cfg.max_generation_size, jnp.int32), cache,
                cross, dia_init_loop_state(cfg), out0, k=SPEC_K)
            n_steps = int(lstate[2])
        else:
            out_tokens, n_steps, cache, sampler_state, _, _ = dia_decode_loop(
                self.params, cfg, jnp.asarray(max_gen, jnp.int32),
                jnp.asarray(cfg.max_generation_size, jnp.int32), cache, cross,
                key, sampler_state, dia_init_loop_state(cfg),
                temperature=config.temperature,
                top_k=config.top_k, top_p=config.top_p,
                repetition_penalty=config.repetition_penalty,
                do_sample=config.sample, use_top_p=config.top_p < 1.0)
            n_steps = int(n_steps)
        outputs = np.asarray(out_tokens)[:n_steps]
        self._cache = cache
        t_decode = time.perf_counter()

        frames = adjust_output_tokens(
            outputs if n_steps else np.zeros((0, cfg.n_output_heads)), cfg)
        if trace is not None:
            eos = (np.where(outputs[:, 0] == cfg.eos_token_id)[0]
                   if n_steps else np.zeros(0, np.int64))
            trace.update({
                "n_steps": n_steps,
                "eos_step_head0": int(eos[0]) if len(eos) else -1,
                "tokens_first_steps": outputs[:8].tolist(),
                "n_frames": int(len(frames)),
                "codes_first_frames": np.asarray(frames[:6], np.int64).tolist(),
            })
            self.last_trace = trace
        audio = self.dac.decode(frames)
        t_end = time.perf_counter()
        return TTSResponse(
            audio=audio, sample_rate=self.sample_rate,
            timings={"encode_ms": (t_encode - t0) * 1e3,
                     "decode_ms": (t_decode - t_encode) * 1e3,
                     "decode_steps": len(outputs),
                     "codec_ms": (t_end - t_decode) * 1e3})


@register_loader("dia")
def load_dia_runner(gguf_file, config: GenerationConfig) -> DiaRunner:
    import dataclasses

    cfg = DiaConfig.from_gguf_kv(gguf_file.kv)
    # raw GGUFTensors for the model so quantized decoder linears stay
    # int8/int4 on device; the DAC codec takes dequantized numpy
    params = load_dia_params(dict(gguf_file.tensors), cfg)
    if dia_params_quantized(params):
        cfg = dataclasses.replace(cfg, kv_dtype="bfloat16")
    dac_tensors = {n: t.to_numpy() for n, t in gguf_file.tensors.items()
                   if n.startswith("dac.") or n.startswith("audio_encoder.")}
    dac = DACDecoder.from_tensors(dac_tensors, gguf_file.kv)
    return DiaRunner(cfg, params, dac, config)
