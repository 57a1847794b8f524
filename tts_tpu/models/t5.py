"""T5 text encoder (Parler's conditional-prompt encoder).

Parity: /root/reference/src/models/parler/t5/model.cpp — encoder-only T5 with
relative position buckets, RMS norms, gated-GELU FFN, optional down-projection
to the Parler hidden size.  One jitted function over a padded token bucket.

NOTE(parity): the reference computes log(ab/max_exact) with *integer*
division (t5/model.cpp:321), collapsing buckets in [max_exact, 2*max_exact);
we use the real T5 formula (float), which is what the checkpoint was trained
with."""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from tts_tpu.text.tokenizers import UnigramTokenizer

TOKEN_BUCKETS = (32, 64, 128, 256, 512)


@dataclass(frozen=True)
class T5Config:
    n_layers: int = 24
    hidden_size: int = 2048
    n_attn_heads: int = 32
    relative_attn_buckets: int = 32
    max_distance: int = 128
    eos_token_id: int = 1
    bos_token_id: int = 0
    max_context_length: int = 512
    vocab_size: int = 32128
    output_size: int | None = None

    @property
    def head_size(self) -> int:
        return 64  # T5 uses fixed d_kv=64 (t5/model.h default)

    @staticmethod
    def from_gguf_kv(kv: dict) -> "T5Config":
        g = lambda k, d: int(kv.get(k, d))
        return T5Config(
            n_layers=g("t5encoder.block_count", 24),
            hidden_size=g("t5encoder.embedding_length", 2048),
            n_attn_heads=g("t5encoder.attention.head_count", 32),
            max_context_length=g("t5encoder.context_length", 512),
            vocab_size=g("t5encoder.vocab_size", 32128),
            output_size=g("t5encoder.output_size", 0) or None,
            bos_token_id=g("tokenizer.ggml.bos_token_id", 0),
            eos_token_id=g("tokenizer.ggml.eos_token_id", 1),
        )


def load_t5_params(tensors: dict, cfg: T5Config) -> dict:
    def get(name, optional=False):
        t = tensors.get(name)
        if t is None:
            if optional:
                return None
            raise KeyError(f"t5: missing tensor {name}")
        return jnp.asarray(np.asarray(t, np.float32))

    p = {
        "embd": get("t5encoder.token_embd"),
        "out_norm": get("t5encoder.enc.final_layer_norm"),
        "rel_b": get("t5encoder.enc.blk.0.attn_rel_b"),   # [n_buckets, heads]
        "layers": [],
    }
    down = get("t5encoder.down_proj", optional=True)
    if down is not None:
        p["down_proj"] = down.T
        p["down_proj_b"] = get("t5encoder.down_proj_bias")
    for i in range(cfg.n_layers):
        L = f"t5encoder.enc.blk.{i}"
        p["layers"].append({
            "attn_norm": get(f"{L}.attn_norm"),
            "q": get(f"{L}.attn_q").T, "k": get(f"{L}.attn_k").T,
            "v": get(f"{L}.attn_v").T, "o": get(f"{L}.attn_o").T,
            "ffn_norm": get(f"{L}.ffn_norm"),
            "wi_0": get(f"{L}.ffn_up").T, "wi_1": get(f"{L}.ffn_gate").T,
            "wo": get(f"{L}.ffn_down").T,
        })
    return p


def _rms_norm(x, w, eps: float = 1e-6):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps) * w


def relative_position_buckets(n: int, n_buckets: int = 32, max_distance: int = 128):
    """Bidirectional T5 relative position buckets [n, n] (query, key).

    Convention: rel = key - query (HF's memory_position - context_position),
    offset bucket-half for rel > 0 (future keys) — verified bit-exact against
    transformers' T5EncoderModel (tests/test_hf_parity.py).  The reference
    fills its pos_bucket with i - ii (t5/model.cpp:314) but GGML consumes the
    tensor with dims reversed, landing on the same HF convention."""
    half = n_buckets // 2
    max_exact = half // 2
    q = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    rel = k - q
    out = np.where(rel > 0, half, 0)
    ab = np.abs(rel)
    log_big = (max_exact +
               (np.log(np.maximum(ab, 1) / max_exact)
                / np.log(max_distance / max_exact) * max_exact)).astype(np.int64)
    val = np.where(ab < max_exact, ab, np.minimum(half - 1, log_big))
    return jnp.asarray(out + val, jnp.int32)


@partial(jax.jit, static_argnames=("cfg",))
def t5_encode(params, cfg: T5Config, tokens, token_mask):
    """tokens [T] int32 padded -> hidden states [T, output_size]."""
    T = tokens.shape[0]
    x = params["embd"][tokens]
    buckets = relative_position_buckets(T, cfg.relative_attn_buckets, cfg.max_distance)
    pos_bias = params["rel_b"][buckets]                 # [T, T, heads]
    pos_bias = jnp.transpose(pos_bias, (2, 0, 1))       # [heads, q, k]
    neg = jnp.asarray(-1e9, x.dtype)
    attn_bias = jnp.where(token_mask[None, None, :] > 0, 0.0, neg)

    H, hs = cfg.n_attn_heads, cfg.head_size
    for L in params["layers"]:
        h = _rms_norm(x, L["attn_norm"])
        q = (h @ L["q"]).reshape(T, H, hs)
        k = (h @ L["k"]).reshape(T, H, hs)
        v = (h @ L["v"]).reshape(T, H, hs)
        logits = jnp.einsum("qhd,khd->hqk", q, k) + pos_bias + attn_bias
        w = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", w, v).reshape(T, H * hs)
        x = x + attn @ L["o"]

        h = _rms_norm(x, L["ffn_norm"])
        h = jax.nn.gelu(h @ L["wi_0"]) * (h @ L["wi_1"])
        x = x + h @ L["wo"]

    x = _rms_norm(x, params["out_norm"])
    if "down_proj" in params:
        x = x @ params["down_proj"] + params["down_proj_b"]
    return x


class T5Runner:
    """Standalone text-encoder runner (text_encoder_from_file parity)."""

    def __init__(self, cfg: T5Config, params: dict, tokenizer: UnigramTokenizer):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer

    @classmethod
    def from_gguf(cls, gguf_file, tokenizer: UnigramTokenizer | None = None):
        cfg = T5Config.from_gguf_kv(gguf_file.kv)
        tensors = {n: t.to_numpy() for n, t in gguf_file.tensors.items()}
        tokenizer = tokenizer or UnigramTokenizer.from_gguf_kv(gguf_file.kv)
        return cls(cfg, load_t5_params(tensors, cfg), tokenizer)

    def encode(self, text: str) -> np.ndarray:
        ids = self.tokenizer.tokenize(text) + [self.cfg.eos_token_id]
        T = len(ids)
        tb = next((b for b in TOKEN_BUCKETS if T <= b), TOKEN_BUCKETS[-1])
        tokens = np.zeros(tb, np.int32)
        tokens[:T] = ids
        mask = np.zeros(tb, np.float32)
        mask[:T] = 1.0
        out = t5_encode(self.params, self.cfg, jnp.asarray(tokens), jnp.asarray(mask))
        return np.asarray(out[:T])
