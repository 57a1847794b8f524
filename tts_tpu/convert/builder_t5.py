"""Random-weight T5 encoder GGUF builder (t5encoder layout) for tests."""

from __future__ import annotations

import numpy as np


def build_t5_tensors(rng: np.random.Generator, *, n_layers: int = 2,
                     hidden: int = 64, heads: int = 4, ffn: int = 128,
                     vocab: int = 120, out_size: int = 64, scale: float = 0.05):
    T: dict[str, np.ndarray] = {}

    def t(name, *shape):
        T[name] = (rng.standard_normal(shape) * scale).astype(np.float32)

    head_dim = 64  # T5 fixed d_kv
    t("t5encoder.token_embd", vocab, hidden)
    t("t5encoder.enc.final_layer_norm", hidden)
    t("t5encoder.down_proj", out_size, hidden)
    t("t5encoder.down_proj_bias", out_size)
    t("t5encoder.enc.blk.0.attn_rel_b", 32, heads)
    for i in range(n_layers):
        L = f"t5encoder.enc.blk.{i}"
        t(f"{L}.attn_norm", hidden)
        t(f"{L}.attn_q", heads * head_dim, hidden)
        t(f"{L}.attn_k", heads * head_dim, hidden)
        t(f"{L}.attn_v", heads * head_dim, hidden)
        t(f"{L}.attn_o", hidden, heads * head_dim)
        t(f"{L}.ffn_norm", hidden)
        t(f"{L}.ffn_up", ffn, hidden)
        t(f"{L}.ffn_gate", ffn, hidden)
        t(f"{L}.ffn_down", hidden, ffn)

    tokens = ["<unk>", "</s>", " "] + [chr(ord("a") + i) for i in range(26)]
    while len(tokens) < vocab:
        tokens.append(f"<extra{len(tokens)}>")
    kv = {
        "general.architecture": "t5encoder",
        "t5encoder.block_count": n_layers,
        "t5encoder.embedding_length": hidden,
        "t5encoder.attention.head_count": heads,
        "t5encoder.context_length": 512,
        "t5encoder.vocab_size": vocab,
        "t5encoder.output_size": out_size,
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": np.full(len(tokens), -1.0, np.float32),
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.eos_token_id": 1,
        "tokenizer.ggml.bos_token_id": 0,
    }
    return T, kv


def write_t5_gguf(path, seed: int = 0, **kwargs):
    from tts_tpu.core.gguf import GGUFWriter

    rng = np.random.default_rng(seed)
    tensors, kv = build_t5_tensors(rng, **kwargs)
    w = GGUFWriter(path)
    for k, v in kv.items():
        w.add_kv(k, v)
    for name, arr in tensors.items():
        w.add_tensor(name, arr)
    w.write()
    return path
