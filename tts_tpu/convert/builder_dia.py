"""Random-weight Dia GGUF builder (encoder-decoder + DAC), tiny dims for tests."""

from __future__ import annotations

import numpy as np

from tts_tpu.convert.builder_codecs import build_dac_tensors


def build_dia_tensors(rng: np.random.Generator, *, enc_layers: int = 2,
                      dec_layers: int = 2, enc_hidden: int = 32,
                      dec_hidden: int = 64, enc_heads: int = 4, dec_heads: int = 4,
                      query_heads: int = 2, head_size: int = 16,
                      n_output_heads: int = 9, vocab: int = 1028,
                      audio_vocab: int = 1024, enc_ctx: int = 128,
                      max_gen: int = 64, ffn: int = 64, scale: float = 0.05):
    T: dict[str, np.ndarray] = {}

    def t(name, *shape):
        T[name] = (rng.standard_normal(shape) * scale).astype(np.float32)

    t("dia.encoder.embedding", 256, enc_hidden)
    t("dia.encoder.norm", enc_hidden)
    for i in range(enc_layers):
        L = f"dia.encoder.layers.{i}"
        t(f"{L}.q_proj", enc_heads * head_size, enc_hidden)
        t(f"{L}.k_proj", enc_heads * head_size, enc_hidden)
        t(f"{L}.v_proj", enc_heads * head_size, enc_hidden)
        t(f"{L}.o_proj", enc_hidden, enc_heads * head_size)
        t(f"{L}.pre_sa_norm", enc_hidden)
        t(f"{L}.post_sa_norm", enc_hidden)
        t(f"{L}.gate", ffn, enc_hidden)
        t(f"{L}.up", ffn, enc_hidden)
        t(f"{L}.wo", enc_hidden, ffn)

    t("dia.decoder.norm", dec_hidden)
    kv_heads = dec_heads // query_heads
    for i in range(n_output_heads):
        t(f"dia.decoder.embeddings.{i}", audio_vocab + 3, dec_hidden)
        t(f"dia.decoder.heads.{i}", vocab, dec_hidden)
    for i in range(dec_layers):
        L = f"dia.decoder.layers.{i}"
        t(f"{L}.self_q_proj", dec_heads * head_size, dec_hidden)
        t(f"{L}.self_k_proj", kv_heads * head_size, dec_hidden)
        t(f"{L}.self_v_proj", kv_heads * head_size, dec_hidden)
        t(f"{L}.self_o_proj", dec_hidden, dec_heads * head_size)
        t(f"{L}.cross_q_proj", dec_heads * head_size, dec_hidden)
        t(f"{L}.cross_k_proj", dec_heads * head_size, enc_hidden)
        t(f"{L}.cross_v_proj", dec_heads * head_size, enc_hidden)
        t(f"{L}.cross_o_proj", dec_hidden, dec_heads * head_size)
        t(f"{L}.pre_sa_norm", dec_hidden)
        t(f"{L}.pre_ca_norm", dec_hidden)
        t(f"{L}.pre_mlp_norm", dec_hidden)
        t(f"{L}.gate", ffn, dec_hidden)
        t(f"{L}.up", ffn, dec_hidden)
        t(f"{L}.wo", dec_hidden, ffn)

    dac_tensors, dac_kv = build_dac_tensors(rng, n_heads=n_output_heads,
                                            codebook_size=audio_vocab)
    T.update(dac_tensors)

    kv = {
        "general.architecture": "dia",
        "dia.encoder.layers": enc_layers,
        "dia.decoder.layers": dec_layers,
        "dia.encoder.hidden_size": enc_hidden,
        "dia.decoder.hidden_size": dec_hidden,
        "dia.encoder.attn_heads": enc_heads,
        "dia.decoder.attn_heads": dec_heads,
        "dia.decoder.query_heads": query_heads,
        "dia.attn_head_size": head_size,
        "dia.decoder.output_heads": n_output_heads,
        "dia.decoder.output_vocab_size": vocab,
        "dia.decoder.audio_vocab_size": audio_vocab,
        "dia.eos_token_id": audio_vocab,
        "dia.pad_token_id": audio_vocab + 1,
        "dia.bos_token_id": audio_vocab + 2,
        "dia.encoder.max_context_length": enc_ctx,
        "dia.decoder.max_generation_size": max_gen,
        "dia.max_delay": 15,
        "dia.cfg_scale": 3.0,
    }
    kv.update(dac_kv)
    return T, kv


def write_dia_gguf(path, seed: int = 0, **kwargs):
    from tts_tpu.core.gguf import GGUFWriter

    rng = np.random.default_rng(seed)
    tensors, kv = build_dia_tensors(rng, **kwargs)
    w = GGUFWriter(path)
    for k, v in kv.items():
        w.add_kv(k, v)
    for name, arr in tensors.items():
        w.add_tensor(name, arr)
    w.write()
    return path
