"""Parler-TTS: decoder-only transformer with precomputed T5 cross-attention,
9 parallel codebook heads, and DAC codec decode.

Parity: /root/reference/src/models/parler/model.cpp — same architecture
(24L, h=1024, 16 heads, learned positional embeddings, biasless projections,
LN with bias), BOS-delay staircase across heads, per-head EOS tracking, and
delay un-weave + invalid-token filtering before the codec
(adjust_output_tokens, model.cpp:734-760).

TPU design: a fixed-shape KV cache [L, 2, max_ctx, H, hs] updated with
dynamic_update_slice inside two jitted functions — `prefill` (prompt batch)
and `decode_step` (one token, on-device sampling) — instead of per-step graph
rebuilds.  The host loop only carries token ids and EOS flags.
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
from tts_tpu.ops.spec import SPEC_K, ngram_draft_rows as _ngram_draft_rows, \
    spec_enabled as _spec_enabled
from tts_tpu.runtime.api import GenerationConfig, TTSResponse, TTSRunner
from tts_tpu.text.tokenizers import UnigramTokenizer

PROMPT_BUCKETS = (16, 32, 64, 128, 256)


@dataclass(frozen=True)
class ParlerConfig:
    n_layers: int = 24
    hidden_size: int = 1024
    n_attn_heads: int = 16
    n_output_heads: int = 9
    output_vocab_size: int = 1088
    audio_vocab_size: int = 1024
    eos_token_id: int = 1024
    bos_token_id: int = 1025
    max_ctx_length: int = 4096
    # cache/cross storage dtype: f32 for dense checkpoints (bit-exact with
    # the NumPy parity path); the loader switches to bfloat16 when decoder
    # weights are quantized (cache noise << weight quantization noise)
    kv_dtype: str = "float32"
    max_generation_size: int = 2580
    n_encode_length: int = 0
    use_cross_attn: bool = True

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.n_attn_heads

    @staticmethod
    def from_gguf_kv(kv: dict) -> "ParlerConfig":
        g = lambda k, d: int(kv.get(k, d))
        return ParlerConfig(
            n_layers=g("parler-tts.decoder.num_hidden_layers", 24),
            hidden_size=g("parler-tts.decoder.hidden_size", 1024),
            n_attn_heads=g("parler-tts.decoder.attention.head_count", 16),
            n_output_heads=g("parler-tts.decoder.output_heads", 9),
            output_vocab_size=g("parler-tts.decoder.out_vocab_size", 1088),
            audio_vocab_size=g("parler-tts.decoder.audio_vocab_size", 1024),
            max_ctx_length=g("parler-tts.decoder.context_length", 4096),
            max_generation_size=g("parler-tts.decoder.max_generation", 2580),
            n_encode_length=g("parler-tts.decoder.encode_length", 0),
            bos_token_id=g("audio.bos_token_id", 1025),
            eos_token_id=g("audio.eos_token_id", 1024),
        )


def load_parler_params(tensors: dict, cfg: ParlerConfig) -> dict:
    """Decoder linears keep GGUF Q8/Q5/Q4 weights int8/int4 on device (the
    per-step decode otherwise reads ~1.3 GB of f32 weights; same
    weights-bandwidth argument as Orpheus/Dia).  Dense checkpoints load
    unchanged so the NumPy parity harness stays bit-exact."""
    from tts_tpu.core.gguf import GGUFTensor
    from tts_tpu.ops.qmatmul import pack_linear

    def get(name):
        t = tensors.get(name)
        if t is None:
            raise KeyError(f"parler: missing tensor {name}")
        if isinstance(t, GGUFTensor):
            t = t.to_numpy()
        return jnp.asarray(np.asarray(t, np.float32))

    def lin(name):
        t = tensors.get(name)
        if t is None:
            raise KeyError(f"parler: missing tensor {name}")
        packed = pack_linear(t)
        return packed if packed is not None else get(name).T

    p = {
        "prompt_embd": get("decoder.embed_prompts"),
        "positional": get("decoder.positional_embed"),
        "text_encoding": get("decoder.text_encoding"),
        "norm_w": get("decoder.layer_norm.weight"),
        "norm_b": get("decoder.layer_norm.bias"),
        "embds": [], "heads": [], "layers": [],
    }
    i = 0
    while f"decoder.embed_tokens.{i}.weight" in tensors:
        p["embds"].append(get(f"decoder.embed_tokens.{i}.weight"))
        i += 1
    i = 0
    while f"decoder.lm_heads.{i}.weight.head" in tensors:
        p["heads"].append(get(f"decoder.lm_heads.{i}.weight.head").T)
        i += 1
    for l in range(cfg.n_layers):
        L = f"decoder.layers.{l}"
        p["layers"].append({
            "sa_norm_w": get(f"{L}.self_attn_layer_norm.weight"),
            "sa_norm_b": get(f"{L}.self_attn_layer_norm.bias"),
            "sa_q": lin(f"{L}.self_attn.q_proj.weight"),
            "sa_k": lin(f"{L}.self_attn.k_proj.weight"),
            "sa_v": lin(f"{L}.self_attn.v_proj.weight"),
            "sa_o": lin(f"{L}.self_attn.out_proj.weight"),
            "ca_norm_w": get(f"{L}.encoder_attn_layer_norm.weight"),
            "ca_norm_b": get(f"{L}.encoder_attn_layer_norm.bias"),
            "ca_q": lin(f"{L}.encoder_attn.q_proj.weight"),
            "ca_k": lin(f"{L}.encoder_attn.k_proj.weight"),
            "ca_v": lin(f"{L}.encoder_attn.v_proj.weight"),
            "ca_o": lin(f"{L}.encoder_attn.out_proj.weight"),
            "fc1": lin(f"{L}.fc1.weight"),
            "fc2": lin(f"{L}.fc2.weight"),
            "out_norm_w": get(f"{L}.final_layer_norm.weight"),
            "out_norm_b": get(f"{L}.final_layer_norm.bias"),
        })
    if parler_params_quantized(p):
        # the 9 lm_heads stream ~40 MB f32 per step; bf16 halves it on
        # already-quantized checkpoints (the head dot still runs f32)
        p["heads"] = [h.astype(jnp.bfloat16) for h in p["heads"]]
    return p


def parler_params_quantized(params) -> bool:
    """True if any decoder linear kept its GGUF quantization on device."""
    return any(isinstance(L[n], dict) for L in params["layers"]
               for n in ("sa_q", "fc1"))


def _ln(x, w, b, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * w + b


def init_kv_cache(cfg: ParlerConfig) -> dict:
    shape = (cfg.n_layers, cfg.max_ctx_length, cfg.n_attn_heads, cfg.head_size)
    dt = jnp.dtype(cfg.kv_dtype)
    return {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}


def precompute_cross_kv(params, cfg: ParlerConfig):
    """text_encoding [enc, hidden] -> per-layer K/V [L, enc, H, hs]
    (parity: prep_cross_key_values, parler/model.cpp:110-173)."""
    enc = params["text_encoding"]
    H, hs = cfg.n_attn_heads, cfg.head_size
    dt = jnp.dtype(cfg.kv_dtype)
    ks, vs = [], []
    for L in params["layers"]:
        ks.append(_lin(enc, L["ca_k"]).reshape(-1, H, hs).astype(dt))
        vs.append(_lin(enc, L["ca_v"]).reshape(-1, H, hs).astype(dt))
    return {"k": jnp.stack(ks), "v": jnp.stack(vs)}


def _layer_attn(x, L, cache_k, cache_v, pos_mask, cfg):
    """Self-attention over the cache (keys beyond pos are masked)."""
    H, hs = cfg.n_attn_heads, cfg.head_size
    T = x.shape[0]
    q = _lin(x, L["sa_q"]).reshape(T, H, hs)
    logits = jnp.einsum("qhd,khd->hqk", q,
                        cache_k.astype(jnp.float32)) / math.sqrt(hs)
    logits = logits + pos_mask
    w = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("hqk,khd->qhd", w,
                      cache_v.astype(jnp.float32)).reshape(T, H * hs)
    return _lin(attn, L["sa_o"])


def _layer_cross_attn(x, L, ck, cv, enc_mask, cfg):
    H, hs = cfg.n_attn_heads, cfg.head_size
    T = x.shape[0]
    q = _lin(x, L["ca_q"]).reshape(T, H, hs)
    logits = jnp.einsum("qhd,khd->hqk", q,
                        ck.astype(jnp.float32)) / math.sqrt(hs)
    logits = logits + enc_mask
    w = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("hqk,khd->qhd", w,
                      cv.astype(jnp.float32)).reshape(T, H * hs)
    return _lin(attn, L["ca_o"])


def _transformer(params, cfg, x, cache, start_pos, q_positions, cross_kv):
    """Shared body for prefill/decode.  x [T, hidden]; writes K/V at
    start_pos..start_pos+T; causal mask against absolute positions."""
    H, hs = cfg.n_attn_heads, cfg.head_size
    T = x.shape[0]
    key_pos = jnp.arange(cfg.max_ctx_length)
    # causal + validity: key visible iff key_pos <= query_pos
    mask = jnp.where(key_pos[None, None, :] <= q_positions[None, :, None], 0.0, -1e9)
    if cross_kv is not None:
        enc_mask = jnp.zeros((1, 1, cross_kv["k"].shape[1]), jnp.float32)

    new_k = cache["k"]
    new_v = cache["v"]
    for l, L in enumerate(params["layers"]):
        res = x
        h = _ln(x, L["sa_norm_w"], L["sa_norm_b"])
        k = _lin(h, L["sa_k"]).reshape(T, H, hs)
        v = _lin(h, L["sa_v"]).reshape(T, H, hs)
        new_k = jax.lax.dynamic_update_slice(
            new_k, k[None].astype(new_k.dtype), (l, start_pos, 0, 0))
        new_v = jax.lax.dynamic_update_slice(
            new_v, v[None].astype(new_v.dtype), (l, start_pos, 0, 0))
        x = res + _layer_attn(h, L, new_k[l], new_v[l], mask, cfg)
        if cross_kv is not None:
            res = x
            h = _ln(x, L["ca_norm_w"], L["ca_norm_b"])
            x = res + _layer_cross_attn(h, L, cross_kv["k"][l], cross_kv["v"][l],
                                        enc_mask, cfg)
        res = x
        h = _ln(x, L["out_norm_w"], L["out_norm_b"])
        h = _lin(jax.nn.gelu(_lin(h, L["fc1"])), L["fc2"])
        x = res + h
    x = _ln(x, params["norm_w"], params["norm_b"])
    return x, {"k": new_k, "v": new_v}


@partial(jax.jit, static_argnames=("cfg", "use_cross"), donate_argnames=("cache",))
def parler_prefill(params, cfg: ParlerConfig, tokens, n_valid, cache, cross_kv,
                   use_cross: bool = True):
    """Text-prompt pass: tokens [Tb] (padded), fills KV 0..n_valid."""
    T = tokens.shape[0]
    x = params["prompt_embd"][tokens] + params["positional"][:T]
    positions = jnp.arange(T)
    # padded positions point at n_valid-1 (their K/V rows are later overwritten)
    positions = jnp.minimum(positions, n_valid - 1)
    x, cache = _transformer(params, cfg, x, cache, 0, positions,
                            cross_kv if use_cross else None)
    return cache


@partial(jax.jit, static_argnames=("cfg", "use_cross", "top_k", "do_sample", "use_top_p"),
         donate_argnames=("cache",))
def parler_decode_step(params, cfg: ParlerConfig, audio_tokens, pos, cache,
                       cross_kv, key, sampler_state, *, use_cross: bool = True,
                       temperature=1.0, top_k: int = 0, top_p=1.0,
                       repetition_penalty=1.0, do_sample: bool = True,
                        use_top_p: bool = True):
    """One AR step: audio_tokens [9] -> sampled [9] + logits row."""
    embds = jnp.stack(params["embds"])           # [9, vocab, hidden]
    x = jnp.sum(embds[jnp.arange(cfg.n_output_heads), audio_tokens], axis=0)
    x = x + params["positional"][pos]
    x = x[None, :]
    x, cache = _transformer(params, cfg, x, cache, pos, pos[None],
                            cross_kv if use_cross else None)
    heads = jnp.stack(params["heads"])           # [9, hidden, vocab]
    logits = jnp.einsum("d,hdv->hv", x[0], heads)
    tokens, sampler_state = sample_tokens(
        key, logits, sampler_state, temperature=temperature, top_k=top_k,
        top_p=top_p, repetition_penalty=repetition_penalty, do_sample=do_sample,
        use_top_p=use_top_p)
    return tokens, cache, sampler_state


@partial(jax.jit, static_argnames=("cfg", "use_cross"))
def parler_step0_logits(params, cfg: ParlerConfig, pos, cache, cross_kv, *,
                        use_cross: bool = True):
    """Per-head logits of decode step 0 (all-BOS frame at the first decode
    position), consuming no loop/PRNG state — the parity-report probe that
    localizes a real-checkpoint mismatch to the backbone vs the sampler/codec
    (VERDICT r3 item 4; reference dump point: parler/model.cpp:734-760)."""
    tokens = jnp.full((cfg.n_output_heads,), cfg.bos_token_id, jnp.int32)
    embds = jnp.stack(params["embds"])
    x = jnp.sum(embds[jnp.arange(cfg.n_output_heads), tokens], axis=0)
    x = x + params["positional"][pos]
    x, _ = _transformer(params, cfg, x[None], cache, pos, pos[None],
                        cross_kv if use_cross else None)
    heads = jnp.stack(params["heads"])
    return jnp.einsum("d,hdv->hv", x[0], heads)


def init_loop_state(cfg: ParlerConfig):
    """Resumable decode-loop carry: (next input tokens, per-head EOS flags,
    global step counter) — lets generate_stream run the loop in chunks."""
    return (jnp.full((cfg.n_output_heads,), cfg.bos_token_id, jnp.int32),
            jnp.zeros((cfg.n_output_heads,), bool),
            jnp.asarray(0, jnp.int32))


@partial(jax.jit, static_argnames=("cfg", "max_steps", "use_cross", "top_k",
                                   "do_sample", "use_top_p"),
         donate_argnames=("cache",))
def parler_decode_loop(params, cfg: ParlerConfig, start_pos, limit, cache,
                       cross_kv, key, sampler_state, loop_state, *,
                       max_steps: int, use_cross: bool = True, temperature=1.0,
                       top_k: int = 0, top_p=1.0, repetition_penalty=1.0,
                       do_sample: bool = True,
                        use_top_p: bool = True):
    """The 9-head AR loop in one dispatch: BOS-delay staircase, per-head EOS
    tracking, and stop-when-all-heads-done run on device (parity:
    generate_from_batch, parler/model.cpp:762-793).  `loop_state` (from
    `init_loop_state` or a previous chunk) makes the loop resumable; the
    BOS staircase follows the GLOBAL step so chunked streaming decodes the
    same tokens as one full dispatch."""
    H = cfg.n_output_heads
    out = jnp.full((max_steps, H), cfg.eos_token_id, jnp.int32)
    embds = jnp.stack(params["embds"])
    heads = jnp.stack(params["heads"])
    head_idx = jnp.arange(H)

    def cond(state):
        step, pos, (tokens, eos_seen, gstep), cache, key, sstate, out = state
        return (step < limit) & ~jnp.all(eos_seen)

    def body(state):
        step, pos, (tokens, eos_seen, gstep), cache, key, sstate, out = state
        x = jnp.sum(embds[head_idx, tokens], axis=0) + params["positional"][pos]
        x, cache = _transformer(params, cfg, x[None], cache, pos, pos[None],
                                cross_kv if use_cross else None)
        logits = jnp.einsum("d,hdv->hv", x[0], heads)
        key, sub = jax.random.split(key)
        sampled, sstate = sample_tokens(
            sub, logits, sstate, temperature=temperature, top_k=top_k,
            top_p=top_p, repetition_penalty=repetition_penalty,
            do_sample=do_sample, use_top_p=use_top_p)
        out = out.at[step].set(sampled)
        eos_seen = eos_seen | (sampled == cfg.eos_token_id)
        nxt = jnp.where(gstep + 1 > head_idx,
                        jnp.where(eos_seen, cfg.eos_token_id, sampled),
                        cfg.bos_token_id).astype(jnp.int32)
        return (step + 1, pos + 1, (nxt, eos_seen, gstep + 1), cache, key,
                sstate, out)

    init = (jnp.asarray(0, jnp.int32), start_pos, loop_state, cache, key,
            sampler_state, out)
    step, pos, loop_state, cache, key, sstate, out = jax.lax.while_loop(
        cond, body, init)
    # the evolved key comes back so a chunked (streaming) caller continues
    # the exact PRNG stream a single full dispatch would use
    return out, step, cache, sstate, loop_state, key


@partial(jax.jit, static_argnames=("cfg", "max_steps", "k", "use_cross",
                                   "force_miss"),
         donate_argnames=("cache", "out_init"))
def parler_decode_loop_spec_resume(params, cfg: ParlerConfig, start_pos, limit,
                                   cache, cross_kv, loop_state, out_init, *,
                                   max_steps: int, k: int = 7,
                                   use_cross: bool = True,
                                   force_miss: bool = False):
    """Resumable GREEDY speculative 9-head decode (VERDICT r4 item 5; the
    orpheus_decode_loop_spec_resume pattern at 9 heads per step).  Each
    iteration drafts k step-rows by prompt lookup (_ngram_draft_rows), builds
    the k+1 staircase INPUT rows the sequential loop would feed (BOS delays +
    per-head EOS pinning evolved along the draft path), verifies all k+1
    positions in ONE forward, and accepts the longest prefix where every one
    of the 9 argmaxes agrees — emitted rows are the model's own greedy
    outputs, so the result is BIT-IDENTICAL to parler_decode_loop with
    do_sample=False (locked by tests/test_parler.py).

    `loop_state` is the sequential loop's (tokens, eos_seen, gstep) carry;
    `out_init` [max_steps + k + 1, 9] carries ALL previously emitted rows so
    the drafter keeps its history across streaming chunks; `limit` is the
    GLOBAL emission bound for this dispatch (i0 + chunk budget).  KV rows
    written for rejected draft positions sit beyond the accepted position and
    are overwritten next iteration before any causal query can read them.
    Returns (out, loop_state, cache, pos)."""
    H = cfg.n_output_heads
    embds = jnp.stack(params["embds"])
    heads = jnp.stack(params["heads"])
    head_idx = jnp.arange(H)
    hid = params["positional"].shape[1]

    def cond(state):
        pos, (tokens, eos_seen, gstep), cache, out = state
        return (gstep < limit) & ~jnp.all(eos_seen)

    def body(state):
        pos, (tokens, eos_seen, gstep), cache, out = state
        if force_miss:
            # draft id -1 never equals an argmax (>= 0): every draft is
            # rejected and each k+1-wide verify emits exactly one row — the
            # worst-case floor for measurement
            drafts = jnp.full((k, H), -1, jnp.int32)
        else:
            drafts = _ngram_draft_rows(out, gstep, k)

        # staircase inputs for the k+1 verify positions: input j consumes
        # draft row j-1 exactly as the sequential body's `nxt` would
        ins = [tokens]
        eos = eos_seen
        for j in range(1, k + 1):
            d = drafts[j - 1]
            eos = eos | (d == cfg.eos_token_id)
            ins.append(jnp.where(gstep + j > head_idx,
                                 jnp.where(eos, cfg.eos_token_id, d),
                                 cfg.bos_token_id).astype(jnp.int32))
        in_mat = jnp.stack(ins)                                   # [k+1, H]

        x = jnp.sum(embds[head_idx[None, :], in_mat], axis=1)    # [k+1, hid]
        x = x + jax.lax.dynamic_slice(params["positional"], (pos, 0),
                                      (k + 1, hid))
        x, cache = _transformer(params, cfg, x, cache, pos,
                                pos + jnp.arange(k + 1),
                                cross_kv if use_cross else None)
        logits = jnp.einsum("td,hdv->thv", x, heads)              # [k+1, H, V]
        g = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)

        # accept the prefix where ALL 9 heads agree with the draft
        agree = jnp.cumprod(jnp.where(jnp.all(drafts == g[:-1], axis=1), 1, 0))
        n_acc = jnp.sum(agree).astype(jnp.int32)                  # 0..k

        # per-head EOS evolution over the would-be-emitted rows; the
        # sequential loop emits the row in which the LAST head EOSes, then
        # its cond stops — truncate the emission the same way
        eos_after = eos_seen[None, :] | (jnp.cumsum(
            g == cfg.eos_token_id, axis=0) > 0)                   # [k+1, H]
        all_done = jnp.all(eos_after, axis=1)                     # [k+1]
        within = jnp.arange(k + 1, dtype=jnp.int32) <= n_acc
        done_any = jnp.any(all_done & within)
        first_done = jnp.argmax(
            jnp.where(within, all_done, False)).astype(jnp.int32)
        n_emit = jnp.where(done_any, first_done + 1, n_acc + 1)
        n_emit = jnp.minimum(n_emit, limit - gstep)               # budget

        emit_buf = jnp.where(jnp.arange(k + 1)[:, None] < n_emit, g,
                             cfg.eos_token_id)
        out = jax.lax.dynamic_update_slice(out, emit_buf, (gstep, 0))
        idx_last = jnp.maximum(n_emit - 1, 0)
        eos_new = eos_after[idx_last]
        gstep_new = gstep + n_emit
        nxt = jnp.where(gstep_new > head_idx,
                        jnp.where(eos_new, cfg.eos_token_id, g[idx_last]),
                        cfg.bos_token_id).astype(jnp.int32)
        return (pos + n_emit, (nxt, eos_new, gstep_new), cache, out)

    init = (start_pos, loop_state, cache, out_init)
    pos, loop_state, cache, out = jax.lax.while_loop(cond, body, init)
    return out, loop_state, cache, pos


def adjust_output_tokens(output: np.ndarray, cfg: ParlerConfig) -> np.ndarray:
    """Delay un-weave + invalid-token filter (parity: model.cpp:734-760).
    output [steps, 9] -> [frames, 9] with frame i head ii = output[i+ii, ii]."""
    steps = len(output)
    frames = []
    for i in range(steps):
        idx = i + np.arange(cfg.n_output_heads)
        if idx[-1] >= steps:
            break
        row = output[idx, np.arange(cfg.n_output_heads)]
        if (row < cfg.audio_vocab_size).all():
            frames.append(row)
    if not frames:
        return np.zeros((0, cfg.n_output_heads), np.int32)
    return np.stack(frames).astype(np.int32)


class ParlerRunner(TTSRunner):
    sample_rate = 44100
    architecture = "parler-tts"
    device_arrays = ("params", "cross_kv", "_cache")
    device_components = ("dac",)

    def __init__(self, cfg: ParlerConfig, params: dict, tokenizer: UnigramTokenizer,
                 dac: DACDecoder, config: GenerationConfig):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.dac = dac
        self.cross_kv = jax.jit(precompute_cross_kv, static_argnames=("cfg",))(
            params, cfg)
        self._cache = None

    def update_conditional_prompt(self, text_encoder_path: str, prompt: str):
        """Re-encode the voice-conditioning prompt with a T5 GGUF
        (parity: parler/model.cpp:510-518).

        NOT safe to call concurrently with generate()/generate_stream(): it
        swaps params["text_encoding"] and recomputes cross_kv in place.  The
        server serializes all calls on a runner through its per-runner lock
        (apps/server.py ServerState._get_runner); direct library users must
        do the same."""
        from tts_tpu.core.gguf import GGUFFile
        from tts_tpu.models.t5 import T5Runner

        with GGUFFile(text_encoder_path) as f:
            t5 = T5Runner.from_gguf(f, tokenizer=self.tokenizer)
            encoding = t5.encode(prompt)
        self.params["text_encoding"] = jnp.asarray(encoding)
        self.cross_kv = jax.jit(precompute_cross_kv, static_argnames=("cfg",))(
            self.params, self.cfg)

    def _prefill(self, text: str, config: GenerationConfig):
        """Tokenize + prompt prefill; returns (cache, key, sampler_state,
        prompt_len, max_steps, use_cross)."""
        cfg = self.cfg
        ids = self.tokenizer.tokenize(text) + [self.tokenizer.eos_token]
        T = len(ids)
        Tb = self._prompt_bucket(T, PROMPT_BUCKETS)
        tokens = np.zeros(Tb, np.int32)
        tokens[:T] = ids

        use_cross = bool(config.use_cross_attn)
        if self._cache is None:
            self._cache = init_kv_cache(cfg)
        cache = jax.tree_util.tree_map(lambda x: x * 0, self._cache)
        cache = parler_prefill(self.params, cfg, jnp.asarray(tokens),
                               jnp.asarray(T, jnp.int32), cache, self.cross_kv,
                               use_cross=use_cross)
        key = jax.random.PRNGKey(config.seed if config.seed is not None else
                                 np.random.randint(0, 2**31 - 1))
        sampler_state = init_state(cfg.n_output_heads)
        max_steps = min(config.max_tokens or cfg.max_generation_size,
                        cfg.max_generation_size, cfg.max_ctx_length - T)
        return cache, key, sampler_state, T, max_steps, use_cross

    def generate_stream(self, text: str, config: GenerationConfig | None = None,
                        chunk_steps: int = 48):
        """Yield audio incrementally: the device loop runs in `chunk_steps`
        slices (resumable loop_state keeps the BOS staircase global) and the
        DAC decodes bounded windows with the emission held RECEPTIVE_FRAMES
        behind the un-weaved frame head — so the concatenated stream equals
        generate()'s audio for the same sampled tokens."""
        config = config or GenerationConfig()
        cfg = self.cfg
        cache, key, sampler_state, T, max_steps, use_cross = self._prefill(
            text, config)
        loop_state = init_loop_state(cfg)
        outputs = np.zeros((0, cfg.n_output_heads), np.int32)
        emitted = 0
        done = False
        # greedy streaming rides the speculative loop chunk-by-chunk (the
        # carried out-buffer keeps the drafter's history across chunks);
        # emitted rows are bit-identical to the sequential loop AND to
        # generate().  Sampled streaming stays sequential (PRNG-consumption
        # contract, as in orpheus).
        spec = _spec_enabled(config)
        out_buf = (jnp.full((cfg.max_generation_size + SPEC_K + 1,
                             cfg.n_output_heads), cfg.eos_token_id, jnp.int32)
                   if spec else None)
        while not done and len(outputs) < max_steps:
            budget = min(chunk_steps, max_steps - len(outputs))
            i_cum = len(outputs)
            if spec:
                out_buf, loop_state, cache, _ = parler_decode_loop_spec_resume(
                    self.params, cfg, jnp.asarray(T + i_cum, jnp.int32),
                    jnp.asarray(i_cum + budget, jnp.int32), cache,
                    self.cross_kv, loop_state, out_buf,
                    max_steps=cfg.max_generation_size, k=SPEC_K,
                    use_cross=use_cross)
                n = int(loop_state[2]) - i_cum
                out_tokens = np.asarray(out_buf)[i_cum:]
            else:
                out_tokens, n_steps, cache, sampler_state, loop_state, key = \
                    parler_decode_loop(
                        self.params, cfg, jnp.asarray(T + i_cum, jnp.int32),
                        jnp.asarray(budget, jnp.int32), cache, self.cross_kv, key,
                        sampler_state, loop_state, max_steps=cfg.max_generation_size,
                        use_cross=use_cross, temperature=config.temperature,
                        top_k=config.top_k, top_p=config.top_p,
                        repetition_penalty=config.repetition_penalty,
                        do_sample=config.sample, use_top_p=config.top_p < 1.0)
                n = int(n_steps)
                out_tokens = np.asarray(out_tokens)
            done = n < budget                     # all heads hit EOS
            outputs = np.concatenate([outputs, out_tokens[:n]])
            frames = adjust_output_tokens(outputs, cfg)
            target = (len(frames) if done or len(outputs) >= max_steps
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
        t0 = time.perf_counter()
        cache, key, sampler_state, T, max_steps, use_cross = self._prefill(
            text, config)
        t_prefill = time.perf_counter()

        # parity-report stage capture: probe step-0 logits BEFORE the loop
        # donates the cache (debug path only — one extra dispatch)
        trace = {} if getattr(self, "capture_trace", False) else None
        if trace is not None:
            from tts_tpu.utils.trace import multihead_logit_stats
            ids = self.tokenizer.tokenize(text) + [self.tokenizer.eos_token]
            trace["prompt_ids"] = [int(i) for i in ids[:24]]
            trace["n_prompt_tokens"] = len(ids)
            trace["step0_logits"] = multihead_logit_stats(np.asarray(
                parler_step0_logits(self.params, cfg, jnp.asarray(T, jnp.int32),
                                    cache, self.cross_kv, use_cross=use_cross),
                np.float32))

        # one dispatch: the whole AR loop runs on device; greedy calls take
        # the speculative loop (bit-identical tokens, see
        # parler_decode_loop_spec_resume)
        if _spec_enabled(config):
            out0 = jnp.full((cfg.max_generation_size + SPEC_K + 1,
                             cfg.n_output_heads), cfg.eos_token_id, jnp.int32)
            out_tokens, loop_state, cache, _ = parler_decode_loop_spec_resume(
                self.params, cfg, jnp.asarray(T, jnp.int32),
                jnp.asarray(max_steps, jnp.int32), cache, self.cross_kv,
                init_loop_state(cfg), out0,
                max_steps=cfg.max_generation_size, k=SPEC_K,
                use_cross=use_cross)
            n_steps = int(loop_state[2])
        else:
            out_tokens, n_steps, cache, sampler_state, _, _ = parler_decode_loop(
                self.params, cfg, jnp.asarray(T, jnp.int32),
                jnp.asarray(max_steps, jnp.int32), cache, self.cross_kv, key,
                sampler_state, init_loop_state(cfg), max_steps=cfg.max_generation_size,
                use_cross=use_cross, temperature=config.temperature,
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
            timings={"prefill_ms": (t_prefill - t0) * 1e3,
                     "decode_ms": (t_decode - t_prefill) * 1e3,
                     "decode_steps": len(outputs),
                     "codec_ms": (t_end - t_decode) * 1e3})


@register_loader("parler-tts")
def load_parler_runner(gguf_file, config: GenerationConfig) -> ParlerRunner:
    import dataclasses

    cfg = ParlerConfig.from_gguf_kv(gguf_file.kv)
    # raw GGUFTensors so quantized decoder linears stay int8/int4 on device;
    # the DAC codec takes dequantized numpy
    params = load_parler_params(dict(gguf_file.tensors), cfg)
    if parler_params_quantized(params):
        cfg = dataclasses.replace(cfg, kv_dtype="bfloat16")
    tokenizer = UnigramTokenizer.from_gguf_kv(gguf_file.kv)
    dac_tensors = {n: t.to_numpy() for n, t in gguf_file.tensors.items()
                   if n.startswith("audio_encoder.") or n.startswith("dac.")}
    dac = DACDecoder.from_tensors(dac_tensors, gguf_file.kv)
    return ParlerRunner(cfg, params, tokenizer, dac, config)
