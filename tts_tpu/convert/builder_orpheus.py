"""Random-weight Orpheus GGUF builder (llama backbone + SNAC + BPE tokenizer)
matching the py-gguf layout — tiny dims for tests."""

from __future__ import annotations

import numpy as np

from tts_tpu.convert.builder_codecs import build_snac_tensors


def build_orpheus_tensors(rng: np.random.Generator, *, n_layers: int = 2,
                          hidden: int = 64, heads: int = 4, kv_heads: int = 2,
                          head_dim: int = 16, vocab: int = 156940,
                          ffn: int = 128, scale: float = 0.05,
                          tiny_vocab: bool = True):
    T: dict[str, np.ndarray] = {}

    def t(name, *shape):
        T[name] = (rng.standard_normal(shape) * scale).astype(np.float32)

    # keep the giant llama-3 vocab semantics but a small embedding table is
    # impossible (token ids index it) -> use the real vocab size with tiny dims
    t("orpheus.embed_tokens", vocab, hidden)
    t("orpheus.lm_head", vocab, hidden)
    t("orpheus.norm", hidden)
    T["orpheus.rope_frequencies"] = np.ones(head_dim // 2, np.float32)
    for l in range(n_layers):
        L = f"orpheus.layers.{l}"
        t(f"{L}.input_layernorm", hidden)
        t(f"{L}.post_attention_layernorm", hidden)
        t(f"{L}.self_attn.q_proj", heads * head_dim, hidden)
        t(f"{L}.self_attn.k_proj", kv_heads * head_dim, hidden)
        t(f"{L}.self_attn.v_proj", kv_heads * head_dim, hidden)
        t(f"{L}.self_attn.o_proj", hidden, heads * head_dim)
        t(f"{L}.mlp.gate_proj", ffn, hidden)
        t(f"{L}.mlp.up_proj", ffn, hidden)
        t(f"{L}.mlp.down_proj", hidden, ffn)

    snac_tensors, snac_kv = build_snac_tensors(rng)
    T.update(snac_tensors)

    kv = {
        "general.architecture": "orpheus",
        "orpheus.layers": n_layers,
        "orpheus.hidden_size": hidden,
        "orpheus.attn_heads": heads,
        "orpheus.kv_attn_heads": kv_heads,
        "orpheus.head_dim": head_dim,
        "orpheus.vocab_size": vocab,
        "orpheus.stopping_token_id": 128258,
        # random weights can't respect the position-dependent SNAC
        # sub-codebook ranges; fold codes into range instead of dropping
        # frames so plumbing tests still produce audio (real converted
        # checkpoints never set this)
        "orpheus.lenient_audio_codes": 1,
        "tokenizer.ggml.bos_token_id": 128000,
        "tokenizer.ggml.eos_token_id": 128009,
    }
    kv.update(snac_kv)

    # minimal BPE vocab covering ascii letters (ids don't need llama parity
    # for random-weight tests)
    tokens = [chr(c) for c in range(33, 127)] + ["Ġ"] + [f"Ġ{chr(c)}" for c in range(97, 123)]
    kv["tokenizer.ggml.tokens"] = tokens
    kv["tokenizer.ggml.merges"] = ["Ġ a"]
    return T, kv


def write_orpheus_gguf(path, seed: int = 0, **kwargs):
    from tts_tpu.core.gguf import GGUFWriter

    rng = np.random.default_rng(seed)
    tensors, kv = build_orpheus_tensors(rng, **kwargs)
    w = GGUFWriter(path)
    for k, v in kv.items():
        w.add_kv(k, v)
    for name, arr in tensors.items():
        w.add_tensor(name, arr)
    w.write()
    return path
