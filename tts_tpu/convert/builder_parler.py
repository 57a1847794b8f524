"""Random-weight Parler-TTS GGUF builder (decoder + DAC + unigram tokenizer)
matching the py-gguf layout — used by tests; the HF converter maps real
checkpoints onto the same names."""

from __future__ import annotations

import numpy as np

from tts_tpu.convert.builder_codecs import build_dac_tensors


def build_parler_tensors(rng: np.random.Generator, *, n_layers: int = 2,
                         hidden: int = 64, heads: int = 4, n_output_heads: int = 9,
                         vocab: int = 1088, audio_vocab: int = 1024,
                         prompt_vocab: int = 120, enc_len: int = 12,
                         enc_hidden: int = 64, max_ctx: int = 512,
                         max_gen: int = 64, ffn: int = 128, scale: float = 0.05):
    T: dict[str, np.ndarray] = {}

    def t(name, *shape):
        T[name] = (rng.standard_normal(shape) * scale).astype(np.float32)

    t("decoder.embed_prompts", prompt_vocab, hidden)
    t("decoder.positional_embed", max_ctx, hidden)
    t("decoder.text_encoding", enc_len, enc_hidden)
    t("decoder.layer_norm.weight", hidden)
    t("decoder.layer_norm.bias", hidden)
    for i in range(n_output_heads):
        t(f"decoder.embed_tokens.{i}.weight", audio_vocab + 2, hidden)
        t(f"decoder.lm_heads.{i}.weight.head", vocab, hidden)
    for l in range(n_layers):
        L = f"decoder.layers.{l}"
        for n in ("self_attn_layer_norm", "encoder_attn_layer_norm", "final_layer_norm"):
            t(f"{L}.{n}.weight", hidden)
            t(f"{L}.{n}.bias", hidden)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t(f"{L}.self_attn.{n}.weight", hidden, hidden)
        t(f"{L}.encoder_attn.q_proj.weight", hidden, hidden)
        t(f"{L}.encoder_attn.k_proj.weight", hidden, enc_hidden)
        t(f"{L}.encoder_attn.v_proj.weight", hidden, enc_hidden)
        t(f"{L}.encoder_attn.out_proj.weight", hidden, hidden)
        t(f"{L}.fc1.weight", ffn, hidden)
        t(f"{L}.fc2.weight", hidden, ffn)

    dac_tensors, dac_kv = build_dac_tensors(rng, n_heads=n_output_heads,
                                            codebook_size=audio_vocab)
    T.update(dac_tensors)

    kv = {
        "general.architecture": "parler-tts",
        "parler-tts.decoder.num_hidden_layers": n_layers,
        "parler-tts.decoder.hidden_size": hidden,
        "parler-tts.decoder.attention.head_count": heads,
        "parler-tts.decoder.output_heads": n_output_heads,
        "parler-tts.decoder.out_vocab_size": vocab,
        "parler-tts.decoder.audio_vocab_size": audio_vocab,
        "parler-tts.decoder.context_length": max_ctx,
        "parler-tts.decoder.max_generation": max_gen,
        "parler-tts.decoder.encode_length": enc_len,
        "audio.bos_token_id": audio_vocab + 1,
        "audio.eos_token_id": audio_vocab,
    }
    kv.update(dac_kv)

    # tiny unigram vocab: chars a..z + space + unk
    tokens = ["<unk>", "</s>", " "] + [chr(ord("a") + i) for i in range(26)]
    while len(tokens) < prompt_vocab:
        tokens.append(f"<extra{len(tokens)}>")
    kv["tokenizer.ggml.tokens"] = tokens
    kv["tokenizer.ggml.scores"] = np.full(len(tokens), -1.0, np.float32)
    kv["tokenizer.ggml.unknown_token_id"] = 0
    kv["tokenizer.ggml.eos_token_id"] = 1
    return T, kv


def write_parler_gguf(path, seed: int = 0, **kwargs):
    from tts_tpu.core.gguf import GGUFWriter

    rng = np.random.default_rng(seed)
    tensors, kv = build_parler_tensors(rng, **kwargs)
    w = GGUFWriter(path)
    for k, v in kv.items():
        w.add_kv(k, v)
    for name, arr in tensors.items():
        w.add_tensor(name, arr)
    w.write()
    return path
