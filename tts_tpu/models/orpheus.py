"""Orpheus: Llama-3.2-3B backbone generating SNAC audio tokens.

Parity: /root/reference/src/models/orpheus/model.{h,cpp} — 28L llama decoder
with GQA (24 q / 8 kv heads), RMS norms, SiLU-gated MLP, RoPE theta 5e5 with
llama-3 frequency scaling (loaded from the `rope_frequencies` tensor), the
"{128259,128000} voice: text {128009,128260,128261,128257}" prompt frame,
stop token, and the 7-token frame -> 3 SNAC codebook redistribution
(tok - 128266 - (i%7)*4096, heads {0,1,2,2,1,2,2}).

TPU design: GQA is computed natively (grouped einsum) instead of
materializing each KV head 3x into the cache (orpheus/model.cpp:194-228);
prefill + single-token decode are jitted with a fixed-shape donated cache and
on-device sampling.  `orpheus_param_specs` provides the tensor-parallel
sharding layout for multi-chip serving.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tts_tpu.codecs.snac import SNACDecoder
from tts_tpu.models.registry import register_loader
from tts_tpu.ops.qmatmul import linear
from tts_tpu.ops.sampling import init_state, sample_tokens
from tts_tpu.runtime.api import GenerationConfig, TTSError, TTSResponse, TTSRunner
from tts_tpu.text.tokenizers import BPETokenizer

ORPHEUS_VOICES = ("zoe", "zac", "jess", "leo", "mia", "julia", "leah")
PREPENDED_TOKENS = (128259, 128000)
APPENDED_TOKENS = (128009, 128260, 128261, 128257)
FRAME_HEAD_MAP = (0, 1, 2, 2, 1, 2, 2)
AUDIO_TOKEN_OFFSET = 128266
PROMPT_BUCKETS = (32, 64, 128, 256, 1024)


@dataclass(frozen=True)
class OrpheusConfig:
    n_layers: int = 28
    hidden_size: int = 3072
    n_attn_heads: int = 24
    n_kv_attn_heads: int = 8
    head_size: int = 128
    vocab_size: int = 156940
    max_context_length: int = 1024
    max_generation_size: int = 2100
    stopping_token_id: int = 128258
    bos_token_id: int = 128000
    eos_token_id: int = 128009
    rope_theta: float = 500000.0
    # decode attention: the variable-length flash kernel reads only the live
    # context (ops/attention.py); False falls back to the einsum formulation.
    # Under a TP mesh the kernel runs inside shard_map over the head axis
    # (GSPMD cannot partition a pallas_call, but shard_map runs it per-shard).
    use_flash_attn: bool = True
    # int8 KV cache: halves cache read/write bytes per decode step; scales
    # fold into the attention logits (see ops/attention.py)
    kv_quant: bool = False
    # tensor-parallel degree (SURVEY §2.9(b)).  >1 routes quantized linears
    # and the flash kernel through shard_map over the 'tp' mesh axis — each
    # shard runs the Pallas kernel on its N- (col) or K- (row) slice.  Static
    # (part of the jit cache key); the mesh itself lives in _TP_MESHES.
    tp: int = 1
    # test-only: fold out-of-range SNAC codes into range instead of dropping
    # the frame (random-weight GGUFs set orpheus.lenient_audio_codes; real
    # checkpoints never do)
    lenient_codes: bool = False

    @property
    def cache_length(self) -> int:
        return self.max_context_length + self.max_generation_size

    @staticmethod
    def from_gguf_kv(kv: dict) -> "OrpheusConfig":
        g = lambda k, d: int(kv.get(k, d))
        hidden = g("orpheus.hidden_size", 3072)
        heads = g("orpheus.attn_heads", 24)
        return OrpheusConfig(
            n_layers=g("orpheus.layers", 28),
            hidden_size=hidden,
            n_attn_heads=heads,
            n_kv_attn_heads=g("orpheus.kv_attn_heads", 8),
            head_size=g("orpheus.head_dim", hidden // heads if hidden // heads else 128),
            vocab_size=g("orpheus.vocab_size", 156940),
            stopping_token_id=g("orpheus.stopping_token_id", 128258),
            bos_token_id=g("tokenizer.ggml.bos_token_id", 128000),
            eos_token_id=g("tokenizer.ggml.eos_token_id", 128009),
            lenient_codes=bool(g("orpheus.lenient_audio_codes", 0)),
        )


def load_orpheus_params(tensors: dict, cfg: OrpheusConfig, dtype=jnp.bfloat16) -> dict:
    """tensors: name -> numpy array OR GGUFTensor.  Q8_0/Q4_0 GGUF weights
    stay int8 on device and run through the Pallas quantized matmul (half the
    HBM bytes per decode step)."""
    from tts_tpu.core.gguf import GGMLType, GGUFTensor
    from tts_tpu.ops.qmatmul import pack_q8_weight

    def raw(name):
        t = tensors.get(name)
        if t is None:
            raise KeyError(f"orpheus: missing tensor {name}")
        return t

    def get(name, cast=True):
        t = raw(name)
        if isinstance(t, GGUFTensor):
            t = t.to_numpy()
        arr = jnp.asarray(np.asarray(t, np.float32))
        return arr.astype(dtype) if cast else arr

    def lin(name):
        """Linear weight: {"w": dense [in, out]}, {"wq","scales"} int8
        (Q8/Q5), or {"wq4","scales"} packed int4 (Q4 — half the HBM bytes
        of int8; decode is weights-bandwidth-bound).  The lm_head's ragged
        vocab width (156,940) is tile-padded so it runs the Pallas kernel
        instead of a full dequantize fallback each step; `_head_logits`
        slices the pad off."""
        t = raw(name)
        pad_n = name.endswith("lm_head")
        # the wide lm_head pads to 1024 columns so the whole-K kernel can
        # ride tn=1024 (qmatmul_chain probe: 587 vs 694 us, +0.3% bytes)
        tile = 1024 if pad_n and t.shape[0] >= 65536 else 256
        if isinstance(t, GGUFTensor) and t.shape[1] % 32 == 0:
            if t.ggml_type == GGMLType.Q4_0 and t.shape[1] % 64 == 0:
                from tts_tpu.ops.qmatmul import pack_q4_weight
                return pack_q4_weight(t, pad_n=pad_n, tile_n=tile)
            if t.ggml_type in (GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q5_0):
                return pack_q8_weight(t, pad_n=pad_n, tile_n=tile)
        return {"w": get(name).T}

    def fuse(parts):
        """Concatenate same-format quantized linears along the output dim:
        one Pallas launch instead of three (per-call overhead is a real cost
        at 8 quantized matmuls x 28 layers per decode step)."""
        for key in ("wq", "wq4"):
            if all(key in part and "w" not in part for part in parts):
                return {key: jnp.concatenate([part[key] for part in parts], axis=1),
                        "scales": jnp.concatenate([part["scales"] for part in parts],
                                                  axis=1)}
        return None

    p = {
        "embd": get("orpheus.embed_tokens"),
        "head": lin("orpheus.lm_head"),
        "out_norm": get("orpheus.norm", cast=False),
        "rope_factors": get("orpheus.rope_frequencies", cast=False),
        "layers": [],
    }
    for l in range(cfg.n_layers):
        L = f"orpheus.layers.{l}"
        layer = {
            "in_norm": get(f"{L}.input_layernorm", cast=False),
            "q": lin(f"{L}.self_attn.q_proj"),
            "k": lin(f"{L}.self_attn.k_proj"),
            "v": lin(f"{L}.self_attn.v_proj"),
            "o": lin(f"{L}.self_attn.o_proj"),
            "post_norm": get(f"{L}.post_attention_layernorm", cast=False),
            "gate": lin(f"{L}.mlp.gate_proj"),
            "up": lin(f"{L}.mlp.up_proj"),
            "down": lin(f"{L}.mlp.down_proj"),
        }
        qkv = fuse([layer["q"], layer["k"], layer["v"]])
        if qkv is not None:
            layer["qkv"] = qkv
            del layer["q"], layer["k"], layer["v"]
        gateup = fuse([layer["gate"], layer["up"]])
        if gateup is not None:
            layer["gateup"] = gateup
            del layer["gate"], layer["up"]
        p["layers"].append(layer)
    return p


def _qlin_shardable(p, tp: int, out_sharded: bool) -> bool:
    """True if a quantized linear's LOCAL shard shapes stay kernel-legal
    under a degree-`tp` split: col-parallel shards N (scales [K/32, N] split
    the same way); row-parallel shards K, which must keep whole 32-row scale
    blocks (and whole nibble half-planes for int4) per shard."""
    w = p.get("wq", p.get("wq4"))
    K32, N = p["scales"].shape
    if out_sharded:
        return N % tp == 0
    if K32 % tp != 0:
        return False
    # int4 rows pack (k, k + K/2) pairs into one byte; a K-split would tear
    # the halves apart, so row-parallel int4 stays replicated
    return "wq4" not in p


def orpheus_param_specs(params, tp: int = 1) -> dict:
    """Tensor-parallel PartitionSpecs: heads/MLP sharded on 'tp'.
    Linear params are dicts ({"w"} dense, {"wq","scales"} int8, or
    {"wq4","scales"} packed int4); all shard the output dim for
    q/k/v/gate/up/head and the input dim for o/down.  Quantized linears run
    inside shard_map (each device calls the Pallas kernel on its slice —
    `_tp_qlinear`), so their wq/scales shard exactly like dense weights as
    long as the split keeps whole scale blocks (`_qlin_shardable`)."""
    def lin_spec(p, out_sharded):
        if "w" not in p and not _qlin_shardable(p, max(tp, 1), out_sharded):
            return {k: P() for k in p}
        spec = P(None, "tp") if out_sharded else P("tp", None)
        return {k: spec for k in p}

    specs = jax.tree_util.tree_map(lambda _: P(), params)
    for L, Ls in zip(params["layers"], specs["layers"]):
        for n in ("q", "k", "v", "gate", "up", "qkv", "gateup"):
            if n in L:
                Ls[n] = lin_spec(L[n], True)
        for n in ("o", "down"):
            Ls[n] = lin_spec(L[n], False)
    specs["head"] = lin_spec(params["head"], True)
    return specs


def _pad_cols(p, mult: int):
    """Zero-pad a linear dict's output dim to a multiple of `mult`."""
    key = next(k for k in ("wq", "wq4", "w") if k in p)
    pad = (-p[key].shape[1]) % mult
    if pad == 0:
        return p
    out = {key: jnp.pad(p[key], ((0, 0), (0, pad)))}
    if "scales" in p:
        out["scales"] = jnp.pad(p["scales"], ((0, 0), (0, pad)))
    return out


def _unfuse_for_tp(params, cfg: OrpheusConfig):
    """Split the loader's fused qkv / gateup linears back into separate
    projections for TP: a contiguous N-shard of the fused matrix crosses
    projection boundaries (device 0 would hold "all of gate", device 1 "all
    of up"), forcing GSPMD collectives between silu(gate) and up.  Per-
    projection col-sharding keeps heads/MLP halves local.  The single-chip
    path keeps the fusion (one Pallas launch instead of three)."""
    def split_lin(p, sizes):
        key = next(k for k in ("wq", "wq4", "w") if k in p)
        bounds = np.cumsum(sizes)[:-1].tolist()
        parts = jnp.split(p[key], bounds, axis=1)
        if key == "w":
            return [{"w": w} for w in parts]
        scs = jnp.split(p["scales"], bounds, axis=1)
        return [{key: w, "scales": s} for w, s in zip(parts, scs)]

    Hq, Hkv, hs = cfg.n_attn_heads, cfg.n_kv_attn_heads, cfg.head_size
    layers = []
    for L in params["layers"]:
        L = dict(L)
        if "qkv" in L:
            L["q"], L["k"], L["v"] = split_lin(
                L.pop("qkv"), [Hq * hs, Hkv * hs, Hkv * hs])
        if "gateup" in L:
            n = L["gateup"]["scales"].shape[1] // 2 if "scales" in L["gateup"] \
                else L["gateup"]["w"].shape[1] // 2
            L["gate"], L["up"] = split_lin(L.pop("gateup"), [n, n])
        layers.append(L)
    return {**params, "layers": layers}


# mesh registry keyed by TP degree: cfg (a static jit arg) carries cfg.tp,
# and trace-time code looks the mesh up here.  One mesh per degree per
# process — re-registering a different mesh invalidates nothing by itself,
# so make_tp_context clears stale jit caches if the mesh changes.
_TP_MESHES: dict[int, object] = {}


def _all_quant_shardable(params, tp: int) -> bool:
    """Every quantized linear must shard for cfg.tp to be set: _orpheus_body
    routes ALL quantized layers through shard_map when tp > 1, so a single
    non-divisible layer keeps the whole model on the replicated path."""
    for L in params["layers"]:
        for n in ("q", "k", "v", "gate", "up", "qkv", "gateup"):
            if n in L and "w" not in L[n] and not _qlin_shardable(L[n], tp, True):
                return False
        for n in ("o", "down"):
            if "w" not in L[n] and not _qlin_shardable(L[n], tp, False):
                return False
    if "w" not in params["head"] and not _qlin_shardable(params["head"], tp, True):
        return False
    return True


def make_tp_context(params, cfg: OrpheusConfig, mesh):
    """Tensor-parallel placement for inference (SURVEY §2.9(b)): device_put
    params per `orpheus_param_specs` and build an empty KV cache sharded on
    kv-heads over 'tp' (head-major cache: heads are axis 1; the scale arrays
    ks/vs shard the same axis).  Dense compute runs under GSPMD with
    collectives (psum after o/down projections) riding ICI; quantized linears
    and the flash-decode kernel are pallas_calls, which GSPMD cannot
    partition — those run inside shard_map islands (`_tp_qlinear`,
    `_flash_decode_tp`), each device invoking the kernel on its shard.

    Returns (params, cache, cfg).  The returned cfg carries tp=mesh size
    when every quantized linear splits cleanly (`_all_quant_shardable`);
    use_flash_attn survives TP when the head axes split with >=2 local KV
    heads (single-row DMA stripes are Mosaic-illegal), and kv_quant follows
    flash (the einsum fallback would dequantize the whole padded cache every
    layer every step).  The exclusions live HERE, in the mechanism, so every
    TP caller inherits them."""
    import dataclasses

    from jax.sharding import NamedSharding

    tp = mesh.shape["tp"]
    if tp > 1:
        params = _unfuse_for_tp(params, cfg)
        # each head shard must stay kernel-tile-legal: N/tp % 256 == 0.
        # Extra zero columns dequantize to 0 and _head_logits slices to
        # vocab_size anyway.
        params = {**params, "head": _pad_cols(params["head"], 256 * tp)}
    shard_quant = tp > 1 and _all_quant_shardable(params, tp)
    shard_heads = (tp > 1 and cfg.n_kv_attn_heads % tp == 0
                   and cfg.n_attn_heads % tp == 0)
    flash_ok = (shard_heads and shard_quant
                and cfg.n_kv_attn_heads // tp >= 2)
    cfg = dataclasses.replace(
        cfg,
        tp=tp if shard_quant else 1,
        use_flash_attn=cfg.use_flash_attn and flash_ok,
        kv_quant=cfg.kv_quant and flash_ok,
    )
    if _TP_MESHES.get(tp) is not None and _TP_MESHES[tp] is not mesh:
        jax.clear_caches()      # stale traces may hold the old mesh
    _TP_MESHES[tp] = mesh
    specs = orpheus_param_specs(params, tp=cfg.tp)
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_s = treedef.flatten_up_to(specs)
    params = jax.tree_util.tree_unflatten(
        treedef, [jax.device_put(x, NamedSharding(mesh, s))
                  for x, s in zip(flat_p, flat_s)])
    cache = init_kv_cache(cfg)
    placed = {}
    for name, arr in cache.items():
        spec = (P(None, "tp", None, None) if arr.ndim == 4 else
                P(None, "tp", None)) if shard_heads else P()
        placed[name] = jax.device_put(arr, NamedSharding(mesh, spec))
    return params, placed, cfg


def _tp_qlinear(x, p, cfg: OrpheusConfig, *, col: bool):
    """Quantized linear under tensor parallelism: shard_map over 'tp' so each
    device runs the Pallas kernel on its weight slice.  Col-parallel
    (q/k/v/gate/up/head) shards the output dim — x replicated in, output
    sharded out.  Row-parallel (o/down) shards the input dim — x arrives
    K-sharded (the col-parallel producer feeds it), partial products psum
    over ICI.  x is [T, K]."""
    from tts_tpu.ops.qmatmul import quantized_matmul, quantized_matmul_q4

    mesh = _TP_MESHES[cfg.tp]
    wkey = "wq4" if "wq4" in p else "wq"
    qm = quantized_matmul_q4 if wkey == "wq4" else quantized_matmul
    wspec = P(None, "tp") if col else P("tp", None)
    xspec = P() if col else P(None, "tp")

    def f(xl, wl, sl):
        out = qm(xl, wl, sl)
        if not col:
            out = jax.lax.psum(out, "tp")
        return out

    return jax.shard_map(
        f, mesh=mesh, in_specs=(xspec, wspec, wspec),
        out_specs=P(None, "tp") if col else P(),
        check_vma=False,
    )(x, p[wkey], p["scales"])


def _lin(x, p, cfg: OrpheusConfig, *, col: bool):
    """Route a linear through shard_map when it's quantized under TP (GSPMD
    handles dense weights and the replicated/single-chip cases)."""
    if cfg.tp > 1 and ("wq" in p or "wq4" in p):
        return _tp_qlinear(x, p, cfg, col=col)
    return linear(x, p)


def _flash_decode_tp(q, k, v, pos, ks, vs, cfg: OrpheusConfig):
    """Flash-decode attention under TP: shard_map over the head axis; each
    device runs the kernel on its Hq/tp query heads against its Hkv/tp KV
    stripe (GQA groups stay intact because make_tp_context only enables this
    when both head counts divide).  q [Hq, hs]; k/v [Hkv, S, hs]."""
    from tts_tpu.ops.attention import gqa_decode_attention_dyn

    mesh = _TP_MESHES[cfg.tp]
    if ks is not None:
        def f(q, k, v, ks, vs, pos):
            return gqa_decode_attention_dyn(q, k, v, pos, k_scale=ks, v_scale=vs)
        return jax.shard_map(
            f, mesh=mesh,
            in_specs=(P("tp", None), P("tp", None, None), P("tp", None, None),
                      P("tp", None), P("tp", None), P()),
            out_specs=P("tp", None), check_vma=False,
        )(q, k, v, ks, vs, pos)

    def f(q, k, v, pos):
        return gqa_decode_attention_dyn(q, k, v, pos)
    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P("tp", None), P("tp", None, None), P("tp", None, None), P()),
        out_specs=P("tp", None), check_vma=False,
    )(q, k, v, pos)


def _rms(x, w, eps: float = 1e-5):
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    return (n * w).astype(x.dtype)


def _rope(x, positions, rope_factors, theta: float):
    """x [T, H, hs]; llama-3 scaled RoPE with per-dim frequency factors
    (the GGUF stores the divisors; parity: ggml_rope_ext usage)."""
    hs = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, hs, 2, dtype=jnp.float32) / hs))
    freqs = freqs / rope_factors
    ang = positions[:, None].astype(jnp.float32) * freqs[None, :]   # [T, hs/2]
    cos = jnp.cos(ang)[:, None, :]
    sin = jnp.sin(ang)[:, None, :]
    # NEOX/llama convention: rotate (x[i], x[i + hs/2]) pairs
    x1 = x[..., : hs // 2].astype(jnp.float32)
    x2 = x[..., hs // 2 :].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _head_logits(x, params, cfg: OrpheusConfig):
    """lm_head projection; slices off tile-padding columns (static width).
    Accepts [H] (sequential decode / prefill last row) or [T, H] (the
    speculative verify forward)."""
    xb = x.astype(jnp.float32)
    out = _lin(xb[None] if x.ndim == 1 else xb, params["head"], cfg, col=True)
    out = out[..., : cfg.vocab_size]
    return out[0] if x.ndim == 1 else out


def padded_cache_length(cfg: OrpheusConfig) -> int:
    """Cache length rounded up to the flash kernel's chunk size."""
    from tts_tpu.ops.attention import S_CHUNK
    return -(-cfg.cache_length // S_CHUNK) * S_CHUNK


def init_kv_cache(cfg: OrpheusConfig) -> dict:
    """Head-major cache [L, Hkv, S, hs] so the flash-decode kernel's per-head
    DMAs are contiguous stripes.  With cfg.kv_quant, k/v are int8 with
    per-(head, position) scales ks/vs [L, Hkv, S] — half the cache traffic;
    scales fold into the attention logits (ops/attention.py)."""
    S = padded_cache_length(cfg)
    shape = (cfg.n_layers, cfg.n_kv_attn_heads, S, cfg.head_size)
    if cfg.kv_quant:
        return {"k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "ks": jnp.zeros(shape[:3], jnp.float32),
                "vs": jnp.zeros(shape[:3], jnp.float32)}
    return {"k": jnp.zeros(shape, jnp.bfloat16), "v": jnp.zeros(shape, jnp.bfloat16)}


def _gqa_attention(q, cache_k, cache_v, mask, cfg):
    """q [T, Hq, hs]; head-major cache [Hkv, S, hs]; grouped-query attention
    without materializing repeated KV heads (einsum path: prefill, TP, and
    tiny-dim tests; decode uses the flash kernel)."""
    Hkv = cfg.n_kv_attn_heads
    group = cfg.n_attn_heads // Hkv
    T = q.shape[0]
    qg = q.reshape(T, Hkv, group, cfg.head_size)
    logits = jnp.einsum("qhgd,hkd->hgqk", qg.astype(jnp.float32),
                        cache_k.astype(jnp.float32)) / math.sqrt(cfg.head_size)
    logits = logits + mask
    w = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("hgqk,hkd->qhgd", w, cache_v.astype(jnp.float32))
    return attn.reshape(T, cfg.n_attn_heads * cfg.head_size)


def _use_flash(cfg: OrpheusConfig, T: int, S: int) -> bool:
    from tts_tpu.ops.attention import S_CHUNK
    return (cfg.use_flash_attn and T == 1 and S % S_CHUNK == 0
            and cfg.head_size % 128 == 0)


def _orpheus_body(params, cfg, tokens, positions, start_pos, cache):
    from tts_tpu.ops.attention import gqa_decode_attention_dyn, quantize_kv

    T = tokens.shape[0]
    x = params["embd"][tokens]
    S = cache["k"].shape[2]
    quant = "ks" in cache
    flash = _use_flash(cfg, T, S)
    if not flash:
        key_pos = jnp.arange(S)
        mask = jnp.where(key_pos[None, None, None, :] <= positions[None, None, :, None],
                         0.0, -1e9).astype(jnp.float32)

    new_cache = dict(cache)
    Hq, Hkv, hs = cfg.n_attn_heads, cfg.n_kv_attn_heads, cfg.head_size
    for l, L in enumerate(params["layers"]):
        res = x
        h = _rms(x, L["in_norm"])
        if "qkv" in L:
            qkv = _lin(h, L["qkv"], cfg, col=True).astype(x.dtype)
            q, k, v = jnp.split(qkv, [Hq * hs, (Hq + Hkv) * hs], axis=-1)
        else:
            q = _lin(h, L["q"], cfg, col=True).astype(x.dtype)
            k = _lin(h, L["k"], cfg, col=True).astype(x.dtype)
            v = _lin(h, L["v"], cfg, col=True).astype(x.dtype)
        q = q.reshape(T, Hq, hs)
        k = k.reshape(T, Hkv, hs)
        v = v.reshape(T, Hkv, hs)
        q = _rope(q, positions, params["rope_factors"], cfg.rope_theta)
        k = _rope(k, positions, params["rope_factors"], cfg.rope_theta)
        if quant:
            kq, ksc = quantize_kv(k)                    # [T,Hkv,hs], [T,Hkv]
            vq, vsc = quantize_kv(v)
            new_cache["k"] = jax.lax.dynamic_update_slice(
                new_cache["k"], kq.transpose(1, 0, 2)[None], (l, 0, start_pos, 0))
            new_cache["v"] = jax.lax.dynamic_update_slice(
                new_cache["v"], vq.transpose(1, 0, 2)[None], (l, 0, start_pos, 0))
            new_cache["ks"] = jax.lax.dynamic_update_slice(
                new_cache["ks"], ksc.T[None], (l, 0, start_pos))
            new_cache["vs"] = jax.lax.dynamic_update_slice(
                new_cache["vs"], vsc.T[None], (l, 0, start_pos))
        else:
            new_cache["k"] = jax.lax.dynamic_update_slice(
                new_cache["k"], k.transpose(1, 0, 2)[None].astype(new_cache["k"].dtype),
                (l, 0, start_pos, 0))
            new_cache["v"] = jax.lax.dynamic_update_slice(
                new_cache["v"], v.transpose(1, 0, 2)[None].astype(new_cache["v"].dtype),
                (l, 0, start_pos, 0))
        if flash:
            if cfg.tp > 1:
                attn = _flash_decode_tp(
                    q[0].astype(jnp.float32), new_cache["k"][l],
                    new_cache["v"][l], positions[0],
                    new_cache["ks"][l] if quant else None,
                    new_cache["vs"][l] if quant else None, cfg)
            else:
                attn = gqa_decode_attention_dyn(
                    q[0].astype(jnp.float32), new_cache["k"][l],
                    new_cache["v"][l], positions[0],
                    k_scale=new_cache["ks"][l] if quant else None,
                    v_scale=new_cache["vs"][l] if quant else None)
            attn = attn.reshape(1, Hq * hs).astype(x.dtype)
        else:
            if quant:
                kd = (new_cache["k"][l].astype(jnp.float32)
                      * new_cache["ks"][l][:, :, None])
                vd = (new_cache["v"][l].astype(jnp.float32)
                      * new_cache["vs"][l][:, :, None])
            else:
                kd, vd = new_cache["k"][l], new_cache["v"][l]
            attn = _gqa_attention(q, kd, vd, mask, cfg).astype(x.dtype)
        x = res + _lin(attn, L["o"], cfg, col=False).astype(x.dtype)
        res = x
        h = _rms(x, L["post_norm"])
        if "gateup" in L:
            gu = _lin(h, L["gateup"], cfg, col=True)
            gate, up = jnp.split(gu, 2, axis=-1)
            h = jax.nn.silu(gate) * up
        else:
            h = (jax.nn.silu(_lin(h, L["gate"], cfg, col=True))
                 * _lin(h, L["up"], cfg, col=True))
        h = _lin(h.astype(x.dtype), L["down"], cfg, col=False).astype(x.dtype)
        x = res + h
    x = _rms(x, params["out_norm"])
    return x, new_cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def orpheus_prefill(params, cfg: OrpheusConfig, tokens, n_valid, cache):
    T = tokens.shape[0]
    positions = jnp.minimum(jnp.arange(T), n_valid - 1)
    x, cache = _orpheus_body(params, cfg, tokens, positions, 0, cache)
    # logits at the last valid position
    last = x[n_valid - 1]
    logits = _head_logits(last, params, cfg)
    return logits, cache


@partial(jax.jit, static_argnames=("cfg", "top_k", "do_sample", "use_top_p"),
         donate_argnames=("cache",))
def orpheus_decode_step(params, cfg: OrpheusConfig, token, pos, cache, key,
                        sampler_state, *, temperature=1.0, top_k: int = 0,
                        top_p=1.0, repetition_penalty=1.0, do_sample: bool = True,
                        use_top_p: bool = True):
    x, cache = _orpheus_body(params, cfg, token[None], pos[None], pos, cache)
    logits = _head_logits(x[0], params, cfg)
    tokens, sampler_state = sample_tokens(
        key, logits[None], sampler_state, temperature=temperature, top_k=top_k,
        top_p=top_p, repetition_penalty=repetition_penalty, do_sample=do_sample,
        use_top_p=use_top_p)
    return tokens[0], cache, sampler_state


@partial(jax.jit, static_argnames=("cfg", "max_steps", "top_k", "do_sample", "use_top_p"),
         donate_argnames=("cache",))
def orpheus_decode_loop(params, cfg: OrpheusConfig, first_token, start_pos,
                        limit, cache, key, sampler_state, *, max_steps: int,
                        temperature=1.0, top_k: int = 0, top_p=1.0,
                        repetition_penalty=1.0, do_sample: bool = True,
                        use_top_p: bool = True):
    """Whole AR generation in ONE dispatch: a `lax.while_loop` that decodes up
    to `limit` (<= static max_steps) tokens on device, stopping at the stop
    token.  Per-step host round-trips (15-50 ms each over the host<->TPU link)
    would otherwise dominate; this keeps decode at weights-bandwidth speed.

    Returns (tokens [max_steps] int32 padded with stop_token, n_generated,
    cache, sampler_state)."""
    out = jnp.full((max_steps,), cfg.stopping_token_id, jnp.int32)

    def cond(state):
        i, token, pos, cache, key, sstate, out = state
        return (i < limit) & (token != cfg.stopping_token_id)

    def body(state):
        i, token, pos, cache, key, sstate, out = state
        x, cache = _orpheus_body(params, cfg, token[None], pos[None], pos, cache)
        logits = _head_logits(x[0], params, cfg)
        key, sub = jax.random.split(key)
        tokens, sstate = sample_tokens(
            sub, logits[None], sstate, temperature=temperature, top_k=top_k,
            top_p=top_p, repetition_penalty=repetition_penalty,
            do_sample=do_sample, use_top_p=use_top_p)
        out = out.at[i].set(tokens[0])
        return (i + 1, tokens[0], pos + 1, cache, key, sstate, out)

    init = (jnp.asarray(0, jnp.int32), first_token, start_pos, cache, key,
            sampler_state, out)
    i, token, pos, cache, key, sstate, out = jax.lax.while_loop(cond, body, init)
    # evolved key returned so chunked streaming continues the same PRNG
    # stream a single full dispatch would use
    return out, i, cache, sstate, key


def _ngram_drafts(out, token, i, k: int):
    """Prompt-lookup drafting over the generated suffix: find the most recent
    earlier occurrence of the last generated 2-gram and propose the `k`
    tokens that followed it; fall back to the previous SNAC frame (audio
    token streams are 7-periodic in head structure), else repeat the last
    token.  `out[j]` for j < i are generated tokens; `token` is out[i-1]
    (or the prefill-sampled token when i == 0)."""
    j = jnp.arange(out.shape[0], dtype=jnp.int32)
    prev = jnp.where(i > 0, out[jnp.maximum(i - 1, 0)], token)
    prev2 = jnp.where(i > 1, out[jnp.maximum(i - 2, 0)], token)
    # 2-gram (prev2, prev) at (j-1, j); draft source rows start at j+1
    # and must lie fully inside the generated region
    match = (out == prev) & (jnp.roll(out, 1) == prev2)
    usable = (j >= 1) & (j + 1 < jnp.maximum(i - 1, 0))
    score = jnp.where(match & usable, j + 1, 0)
    best = jnp.argmax(score).astype(jnp.int32)
    found = score[best] > 0
    src = jnp.where(found, best + 1, jnp.maximum(i - 7, 0))
    drafts = jax.lax.dynamic_slice(out, (src,), (k,))
    return jnp.where(found | (i >= 7), drafts, jnp.full((k,), prev))


@partial(jax.jit, static_argnames=("cfg", "max_steps", "k", "force_miss"),
         donate_argnames=("cache",))
def orpheus_decode_loop_spec(params, cfg: OrpheusConfig, first_token, start_pos,
                             limit, cache, *, max_steps: int, k: int = 7,
                             force_miss: bool = False):
    """Self-speculative GREEDY decode in ONE dispatch (VERDICT r2 item 3).

    At int4 + flash + int8-KV the single-token step is no longer
    weight-bound; per-step fixed cost (28 layers of kernel dispatches +
    sampling) dominates.  Each iteration here:
      1. drafts `k` tokens with prompt-lookup (n-gram) drafting: find the
         most recent earlier occurrence of the last generated 2-gram and
         propose the tokens that followed it (no draft model needed; audio
         token streams repeat during steady sounds/silence).  Fallback: the
         previous SNAC frame (7-periodic structure).
      2. verifies all k+1 positions in ONE forward (T = k+1; the small-M
         block-diagonal quantized kernels keep it weight-bandwidth-bound),
      3. accepts the longest draft prefix the greedy argmax agrees with and
         emits `accepted + 1` tokens (the model's own outputs, so the result
         is BIT-IDENTICAL to the sequential greedy loop).

    KV slots written for rejected drafts sit beyond the accepted position and
    are overwritten before any later query's causal mask can reach them.
    Returns (tokens [max_steps], n_generated, cache)."""
    out = jnp.full((max_steps + k + 1,), cfg.stopping_token_id, jnp.int32)
    # .__wrapped__: inline the core into THIS jit (one dispatch, no nested-jit
    # donation warnings); generate_stream calls the jitted core directly
    out, i, cache = orpheus_decode_loop_spec_resume.__wrapped__(
        params, cfg, first_token, start_pos, jnp.asarray(0, jnp.int32), limit,
        cache, out, max_steps=max_steps, k=k, force_miss=force_miss)
    return out[:max_steps], i, cache


@partial(jax.jit, static_argnames=("cfg", "max_steps", "k", "force_miss"),
         donate_argnames=("cache", "out_init"))
def orpheus_decode_loop_spec_resume(params, cfg: OrpheusConfig, token,
                                    start_pos, i0, limit, cache, out_init, *,
                                    max_steps: int, k: int = 7,
                                    force_miss: bool = False):
    """Resumable core of the greedy speculative loop: decodes from emission
    index `i0` (with `out_init` carrying all previously emitted tokens, so the
    n-gram drafter keeps its full history across chunk boundaries) until
    emission index `limit` or the stop token.  `generate` runs it once with
    i0=0 / limit=max generation budget; `generate_stream` calls it per chunk
    with the carried (out, cache) — the emitted greedy tokens are
    bit-identical either way (VERDICT r3 item 3: streaming gets the
    speculative win).  Returns (out [max_steps+k+1], i, cache)."""
    out = out_init

    def cond(state):
        i, token, pos, cache, out, done = state
        return (i < limit) & ~done

    def body(state):
        i, token, pos, cache, out, done = state
        if force_miss:
            # worst-case floor for measurement: draft id -1 never equals an
            # argmax (>= 0), so every draft is rejected and each k+1-wide
            # verify forward emits exactly one token.  (The embedding lookup
            # of -1 is still real — JAX indexing wraps it to
            # embd[vocab_size-1] — but those positions' logits and KV writes
            # are discarded/overwritten, so only the never-matches property
            # matters.)
            drafts = jnp.full((k,), -1, jnp.int32)
        else:
            drafts = _ngram_drafts(out, token, i, k)

        # ---- verify: one forward over [token, drafts...] ------------------
        tokens_vec = jnp.concatenate([token[None], drafts])
        positions = pos + jnp.arange(k + 1, dtype=jnp.int32)
        x, cache = _orpheus_body(params, cfg, tokens_vec, positions, pos, cache)
        logits = _head_logits(x, params, cfg)            # [k+1, V]
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        # ---- accept the agreeing prefix, emit n_acc + 1 tokens ------------
        agree = jnp.cumprod(jnp.where(drafts == g[:-1], 1, 0))
        n_acc = jnp.sum(agree).astype(jnp.int32)         # 0..k accepted drafts
        emit = jnp.arange(k + 1, dtype=jnp.int32) <= n_acc
        # truncate at the first stop token within the emitted range
        is_stop = (g == cfg.stopping_token_id) & emit
        stop_any = jnp.any(is_stop)
        first_stop = jnp.argmax(is_stop).astype(jnp.int32)
        n_emit = jnp.where(stop_any, first_stop + 1, n_acc + 1)
        n_emit = jnp.minimum(n_emit, limit - i)          # honor the budget
        emit_buf = jnp.where(jnp.arange(k + 1) < n_emit, g,
                             cfg.stopping_token_id)
        out = jax.lax.dynamic_update_slice(out, emit_buf, (i,))
        last = g[jnp.maximum(n_emit - 1, 0)]
        done = stop_any | (i + n_emit >= limit)
        return (i + n_emit, last, pos + n_emit, cache, out, done)

    init = (i0, token, start_pos, cache, out, jnp.asarray(False))
    i, token, pos, cache, out, done = jax.lax.while_loop(cond, body, init)
    return out, i, cache


def redistribute_output_tokens(tokens: list[int], cfg: OrpheusConfig):
    """7-token frames -> 3 SNAC head streams (parity: orpheus/model.cpp:371-387).

    Frames containing out-of-range codes (outside [0, 4096) after the offset
    subtraction — e.g. a sampled text token mid-stream) are DROPPED whole so
    the 1/2/4-per-frame head alignment is preserved; the reference's uint32
    arithmetic would wrap these into huge invalid codebook indices instead.
    cfg.lenient_codes (test GGUFs only) folds codes into range instead —
    random weights can't respect the position-dependent sub-codebook ranges,
    so strict dropping would leave plumbing tests with zero audio."""
    heads: list[list[int]] = [[], [], []]
    dropped = 0
    for i in range(len(tokens) // 7):
        frame = [int(tokens[i * 7 + ii]) - AUDIO_TOKEN_OFFSET - (ii % 7) * 4096
                 for ii in range(7)]
        if cfg.lenient_codes:
            frame = [t % 4096 for t in frame]
        elif any(t < 0 or t >= 4096 for t in frame):
            dropped += 1
            continue
        for ii, t in enumerate(frame):
            heads[FRAME_HEAD_MAP[ii]].append(t)
    if dropped:
        import logging
        logging.getLogger("tts_tpu").warning(
            "orpheus: dropped %d frame(s) with out-of-range SNAC codes", dropped)
    return [np.asarray(h, np.int32) for h in heads]


class OrpheusRunner(TTSRunner):
    sample_rate = 24000
    architecture = "orpheus"
    device_arrays = ("params", "_cache")
    device_components = ("snac",)

    def __init__(self, cfg: OrpheusConfig, params: dict, tokenizer: BPETokenizer,
                 snac: SNACDecoder, config: GenerationConfig, mesh=None):
        self.mesh = mesh
        if mesh is not None:
            # make_tp_context returns a cfg with the TP exclusions applied
            # (use_flash_attn/kv_quant off); the runner must read THAT cfg,
            # not the one it was constructed with.
            params, self._cache, cfg = make_tp_context(params, cfg, mesh)
        else:
            self._cache = None
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.snac = snac

    def list_voices(self):
        return list(ORPHEUS_VOICES)

    def generate_stream(self, text: str, config: GenerationConfig | None = None,
                        chunk_tokens: int = 70):
        """Yield audio chunks as tokens are generated: the device loop runs in
        `chunk_tokens` slices (10 SNAC frames ~ 0.85 s of audio each) and the
        codec re-decodes with context, yielding only the new samples."""
        config = config or GenerationConfig()
        cfg = self.cfg
        if config.voice and config.voice not in ORPHEUS_VOICES:
            raise TTSError(f"Voice '{config.voice}' is not a valid voice for Orpheus.")
        sentence = f"{config.voice}: {text}" if config.voice else text
        ids = (list(PREPENDED_TOKENS) + self.tokenizer.tokenize(sentence)
               + list(APPENDED_TOKENS))
        if len(ids) > cfg.max_context_length:
            raise TTSError("The prompt was too large for the default context window.")
        T = len(ids)
        Tb = self._prompt_bucket(T, PROMPT_BUCKETS)
        tokens = np.zeros(Tb, np.int32)
        tokens[:T] = ids

        if self._cache is None:
            self._cache = init_kv_cache(cfg)
        cache = jax.tree_util.tree_map(lambda x: x * 0, self._cache)
        logits, cache = orpheus_prefill(self.params, cfg, jnp.asarray(tokens),
                                        jnp.asarray(T, jnp.int32), cache)
        key = jax.random.PRNGKey(config.seed if config.seed is not None else
                                 np.random.randint(0, 2**31 - 1))
        sampler_state = init_state(1)
        key, sub = jax.random.split(key)
        first, sampler_state = sample_tokens(
            sub, logits[None], sampler_state, temperature=config.temperature,
            top_k=config.top_k, top_p=config.top_p,
            repetition_penalty=config.repetition_penalty, do_sample=config.sample, use_top_p=config.top_p < 1.0)
        outputs = [int(first[0])]
        pos = T
        max_steps = min(config.max_tokens or cfg.max_generation_size,
                        cfg.max_generation_size)
        emitted_frames = 0
        # greedy streaming takes the speculative loop chunk-by-chunk via the
        # resumable core (carried out-buffer keeps the n-gram drafter's
        # history across chunks); emitted tokens are bit-identical to the
        # sequential loop AND to generate().  Sampled streaming stays on the
        # sequential loop: its PRNG-consumption contract (stream == generate
        # for the same seed) would not survive chunk-dependent draft windows.
        import os as _os
        spec = not _os.environ.get("TTS_TPU_NO_SPEC") and not config.sample
        spec_k = 7
        out_buf = (jnp.full((cfg.max_generation_size + spec_k + 1,),
                            cfg.stopping_token_id, jnp.int32) if spec else None)
        i_cum = 0
        while outputs[-1] != cfg.stopping_token_id and len(outputs) < max_steps:
            budget = min(chunk_tokens, max_steps - len(outputs))
            if spec:
                out_buf, i_new, cache = orpheus_decode_loop_spec_resume(
                    self.params, cfg, jnp.asarray(outputs[-1], jnp.int32),
                    jnp.asarray(pos, jnp.int32),
                    jnp.asarray(i_cum, jnp.int32),
                    jnp.asarray(i_cum + budget, jnp.int32), cache, out_buf,
                    max_steps=cfg.max_generation_size, k=spec_k)
                i_new = int(i_new)
                n = i_new - i_cum
                new = [int(t) for t in np.asarray(out_buf)[i_cum:i_new]]
                i_cum = i_new
            else:
                toks, n, cache, sampler_state, key = orpheus_decode_loop(
                    self.params, cfg, jnp.asarray(outputs[-1], jnp.int32),
                    jnp.asarray(pos, jnp.int32), jnp.asarray(budget, jnp.int32),
                    cache, key, sampler_state, max_steps=cfg.max_generation_size,
                    temperature=config.temperature, top_k=config.top_k,
                    top_p=config.top_p, repetition_penalty=config.repetition_penalty,
                    do_sample=config.sample, use_top_p=config.top_p < 1.0)
                n = int(n)
                new = [int(t) for t in np.asarray(toks)[:n]]
            # the carried token was already emitted; decode_loop re-decodes it
            outputs.extend(new)
            pos += n
            clean = [t for t in outputs if t != cfg.stopping_token_id]
            heads = redistribute_output_tokens(clean, cfg)
            total_frames = len(heads[-1])
            # bounded-context window decode: O(chunk) codec work per chunk;
            # hold RECEPTIVE_FRAMES back so every emitted sample has full
            # right context -> the stream equals a single full decode exactly
            target = total_frames - self.snac.RECEPTIVE_FRAMES
            if target > emitted_frames:
                audio = self.snac.decode_window(heads, emitted_frames, target,
                                                seed=config.seed or 0)
                emitted_frames = target
                if len(audio):
                    yield audio
            if n < budget:
                break
        # final flush: the held-back tail (and anything not yet emitted)
        clean = [t for t in outputs if t != cfg.stopping_token_id]
        heads = redistribute_output_tokens(clean, cfg)
        if len(heads[-1]) > emitted_frames:
            audio = self.snac.decode_window(heads, emitted_frames,
                                            len(heads[-1]), seed=config.seed or 0)
            if len(audio):
                yield audio
        self._cache = cache

    def generate(self, text: str, config: GenerationConfig | None = None) -> TTSResponse:
        import time

        config = config or GenerationConfig()
        cfg = self.cfg
        if config.voice and config.voice not in ORPHEUS_VOICES:
            raise TTSError(f"Voice '{config.voice}' is not a valid voice for Orpheus.")

        t0 = time.perf_counter()
        sentence = f"{config.voice}: {text}" if config.voice else text
        ids = (list(PREPENDED_TOKENS) + self.tokenizer.tokenize(sentence)
               + list(APPENDED_TOKENS))
        if len(ids) > cfg.max_context_length:
            raise TTSError("The prompt was too large for the default context "
                           "window. Try splitting up or shortening the prompt.")
        T = len(ids)
        Tb = self._prompt_bucket(T, PROMPT_BUCKETS)
        tokens = np.zeros(Tb, np.int32)
        tokens[:T] = ids

        if self._cache is None:
            self._cache = init_kv_cache(cfg)
        cache = jax.tree_util.tree_map(lambda x: x * 0, self._cache)
        logits, cache = orpheus_prefill(self.params, cfg, jnp.asarray(tokens),
                                        jnp.asarray(T, jnp.int32), cache)
        t_prefill = time.perf_counter()

        key = jax.random.PRNGKey(config.seed if config.seed is not None else
                                 np.random.randint(0, 2**31 - 1))
        sampler_state = init_state(1)
        # sample the first token from the prefill logits
        key, sub = jax.random.split(key)
        first, sampler_state = sample_tokens(
            sub, logits[None], sampler_state, temperature=config.temperature,
            top_k=config.top_k, top_p=config.top_p,
            repetition_penalty=config.repetition_penalty, do_sample=config.sample, use_top_p=config.top_p < 1.0)

        max_steps = min(config.max_tokens or cfg.max_generation_size,
                        cfg.max_generation_size)
        # one dispatch: the whole AR loop runs on device.  Single-chip greedy
        # decode takes the self-speculative loop (n-gram draft + batched
        # verify, bit-identical outputs; measured on-TPU r4: 449 vs 215 tok/s
        # warm, FORCE_MISS floor 151 tok/s).  SAMPLED decode stays on the
        # sequential loop: the rejection-scheme speculative sampler was built,
        # proven distribution-exact, and measured SLOWER on-TPU (150 vs
        # 209 tok/s — the per-window residual-redraw/top-p filtering over
        # [k+1, V] costs more than the saved weight reads), so it was removed
        # (VERDICT r3 item 2b: measured -> reverted).  TTS_TPU_NO_SPEC=1
        # forces the one-token-per-step loop everywhere.  The spec loop also
        # runs under TP (VERDICT r4 item 2): its verify forward is the same
        # _orpheus_body the TP sequential loop already runs — quantized
        # linears in shard_map islands, einsum attention at T=k+1 (flash
        # requires T==1 either way) — and the n-gram drafter is replicated
        # scalar work; tests/test_parallel.py asserts TP spec == TP
        # sequential == unsharded greedy tokens.
        import os as _os
        spec_ok = not _os.environ.get("TTS_TPU_NO_SPEC")
        if spec_ok and not config.sample:
            tokens_arr, n_generated, cache = orpheus_decode_loop_spec(
                self.params, cfg, first[0], jnp.asarray(T, jnp.int32),
                jnp.asarray(max_steps - 1, jnp.int32), cache,
                max_steps=cfg.max_generation_size)
        else:
            tokens_arr, n_generated, cache, sampler_state, _ = orpheus_decode_loop(
                self.params, cfg, first[0], jnp.asarray(T, jnp.int32),
                jnp.asarray(max_steps - 1, jnp.int32), cache, key, sampler_state,
                max_steps=cfg.max_generation_size,
                temperature=config.temperature, top_k=config.top_k,
                top_p=config.top_p, repetition_penalty=config.repetition_penalty,
                do_sample=config.sample, use_top_p=config.top_p < 1.0)
        n = int(n_generated)
        outputs = [int(first[0])] + [int(t) for t in np.asarray(tokens_arr)[:n]]
        self._cache = cache
        t_decode = time.perf_counter()

        raw = list(outputs)            # pre-strip stream (trace: EOS position)
        while outputs and outputs[-1] == cfg.stopping_token_id:
            outputs = outputs[:-1]
        heads = redistribute_output_tokens(outputs, cfg)
        if getattr(self, "capture_trace", False):
            # parity-report stage capture (VERDICT r3 item 4; reference dump
            # point: orpheus/model.cpp:371-387 redistribution)
            from tts_tpu.utils.trace import logit_stats
            stop = cfg.stopping_token_id
            self.last_trace = {
                "prompt_ids": ids[:24],
                "n_prompt_tokens": T,
                "step0_logits": logit_stats(np.asarray(logits, np.float32)),
                "first_token": int(first[0]),
                "tokens_first": outputs[:32],
                "n_tokens": len(outputs),
                "eos_step": raw.index(stop) if stop in raw else -1,
                "head_lengths": [int(len(h)) for h in heads],
                "head_streams": [h[:16].tolist() for h in heads],
            }
        audio = self.snac.decode(heads, seed=config.seed or 0)
        t_end = time.perf_counter()
        return TTSResponse(
            audio=audio, sample_rate=self.sample_rate,
            timings={"prefill_ms": (t_prefill - t0) * 1e3,
                     "decode_ms": (t_decode - t_prefill) * 1e3,
                     "decode_steps": len(outputs),
                     "codec_ms": (t_end - t_decode) * 1e3})


@register_loader("orpheus")
def load_orpheus_runner(gguf_file, config: GenerationConfig,
                        mesh=None) -> OrpheusRunner:
    """mesh: optional tp Mesh — shards the backbone tensor-parallel via
    `make_tp_context` (kv cache on heads, q/k/v/gate/up/head on output dim,
    o/down on input dim; quantized linears and the flash kernel run inside
    shard_map islands).  TTS_TPU_ORPHEUS_KV=int8 switches to the int8 KV
    cache (half the attention bytes per step)."""
    import dataclasses
    import os

    cfg = OrpheusConfig.from_gguf_kv(gguf_file.kv)
    if os.environ.get("TTS_TPU_ORPHEUS_KV", "").lower() == "int8":
        cfg = dataclasses.replace(cfg, kv_quant=True)
    # under a TP mesh, make_tp_context (called by the runner) applies the
    # feasibility gates (flash / kv_quant / quantized sharding) — see its
    # docstring
    params = load_orpheus_params(dict(gguf_file.tensors), cfg)
    snac_tensors = {n: t.to_numpy() for n, t in gguf_file.tensors.items()
                    if n.startswith("snac.")}
    tokenizer = BPETokenizer.from_gguf_kv(gguf_file.kv)
    snac = SNACDecoder.from_tensors(snac_tensors, gguf_file.kv)
    return OrpheusRunner(cfg, params, tokenizer, snac, config, mesh=mesh)
