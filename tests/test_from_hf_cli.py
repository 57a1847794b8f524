"""Converter CLIs exercised offline on synthetic checkpoints with the real
upstream tensor NAMES and LAYOUTS (torch module-path names, DenseGeneral
shapes, weight-norm splits) — upgrading the converters from 'mapping
functions unit-tested' to 'CLI runs end-to-end and the GGUF loads and
generates' without network access."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tts_tpu.models.registry import runner_from_file
from tts_tpu.runtime.api import GenerationConfig


def _invert_weight_norm(w: np.ndarray):
    """weight -> (g, v) with regularize(g, v) == w (v=w, g=||w|| rows)."""
    g = np.linalg.norm(w.reshape(w.shape[0], -1), axis=1)
    shape = (-1,) + (1,) * (w.ndim - 1)
    return g.reshape(shape).astype(np.float32), w.astype(np.float32)


def _dac_torch_sd(prefix: str, rng) -> dict:
    """Synthetic descript-DAC state dict (module names under `prefix`),
    shaped to match builder_codecs.build_dac_tensors tiny dims."""
    from tts_tpu.convert.builder_codecs import build_dac_tensors

    ours, _ = build_dac_tensors(rng)
    sd = {}

    def put(name, arr, weight_norm=False):
        if weight_norm:
            g, v = _invert_weight_norm(arr)
            sd[f"{prefix}{name}_g"] = g
            sd[f"{prefix}{name}_v"] = v
        else:
            sd[f"{prefix}{name}"] = np.asarray(arr, np.float32)

    put("decoder.model.0.weight", ours["audio_encoder.initial.weight"],
        weight_norm=True)
    put("decoder.model.0.bias", ours["audio_encoder.initial.bias"])
    for i in range(1, 5):
        b = f"audio_encoder.decoder_block.{i}"
        put(f"decoder.model.{i}.block.0.alpha", ours[f"{b}.final.alpha"])
        put(f"decoder.model.{i}.block.1.weight", ours[f"{b}.final.weight"],
            weight_norm=True)
        put(f"decoder.model.{i}.block.1.bias", ours[f"{b}.final.bias"])
        for j in range(3):
            u = f"{b}.residual_unit.{j}"
            blk = f"decoder.model.{i}.block.{j + 2}.block"
            put(f"{blk}.0.alpha", ours[f"{u}.res.initial.alpha"])
            put(f"{blk}.1.weight", ours[f"{u}.res.initial.weight"],
                weight_norm=True)
            put(f"{blk}.1.bias", ours[f"{u}.res.initial.bias"])
            put(f"{blk}.2.alpha", ours[f"{u}.res.final.alpha"])
            put(f"{blk}.3.weight", ours[f"{u}.res.final.weight"])
            put(f"{blk}.3.bias", ours[f"{u}.res.final.bias"])
    put("decoder.model.5.alpha", ours["audio_encoder.final.alpha"])
    put("decoder.model.6.weight", ours["audio_encoder.final.weight"])
    put("decoder.model.6.bias", ours["audio_encoder.final.bias"])
    for i in range(9):
        q = f"audio_encoder.quantizers.{i}"
        put(f"quantizer.quantizers.{i}.codebook.weight", ours[f"{q}.codebook.weight"])
        put(f"quantizer.quantizers.{i}.out_proj.weight", ours[f"{q}.out_proj.weight"],
            weight_norm=True)
        put(f"quantizer.quantizers.{i}.out_proj.bias", ours[f"{q}.out_proj.bias"])
        put(f"quantizer.quantizers.{i}.in_proj.weight", ours[f"{q}.out_proj.weight"])
    return sd


def test_parler_converter_cli_offline(tmp_path):
    from tts_tpu.convert.builder_parler import build_parler_tensors
    from tts_tpu.convert.builder_t5 import build_t5_tensors
    from tts_tpu.convert import from_hf

    rng = np.random.default_rng(0)
    ours, kv = build_parler_tensors(rng)
    sd = {}
    # decoder tensors: our GGUF names -> raw HF checkpoint names
    for name, arr in ours.items():
        if name.startswith("audio_encoder.") or name == "decoder.text_encoding":
            continue
        if name == "decoder.embed_prompts":
            sd["embed_prompts.weight"] = arr
        elif name == "decoder.positional_embed":
            sd["decoder.model.decoder.embed_positions.weights"] = arr
        elif name.startswith("decoder.lm_heads."):
            i = name.split(".")[2]
            sd[f"decoder.lm_heads.{i}.weight"] = arr
        elif name.startswith("decoder."):
            sd[f"decoder.model.decoder.{name[len('decoder.'):]}"] = arr
    sd.update(_dac_torch_sd("audio_encoder.model.", np.random.default_rng(1)))

    # t5 text encoder weights (HF module names) matching our t5 tiny dims
    t5_ours, _ = build_t5_tensors(np.random.default_rng(2), hidden=64, heads=1,
                                  out_size=64)
    del t5_ours["t5encoder.down_proj"], t5_ours["t5encoder.down_proj_bias"]
    inv = {
        "t5encoder.token_embd": "shared.weight",
        "t5encoder.enc.final_layer_norm": "encoder.final_layer_norm.weight",
        "t5encoder.enc.blk.0.attn_rel_b":
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
    }
    for i in range(2):
        L = f"t5encoder.enc.blk.{i}"
        H = f"encoder.block.{i}.layer"
        inv.update({f"{L}.attn_q": f"{H}.0.SelfAttention.q.weight",
                    f"{L}.attn_k": f"{H}.0.SelfAttention.k.weight",
                    f"{L}.attn_v": f"{H}.0.SelfAttention.v.weight",
                    f"{L}.attn_o": f"{H}.0.SelfAttention.o.weight",
                    f"{L}.attn_norm": f"{H}.0.layer_norm.weight",
                    f"{L}.ffn_up": f"{H}.1.DenseReluDense.wi_0.weight",
                    f"{L}.ffn_gate": f"{H}.1.DenseReluDense.wi_1.weight",
                    f"{L}.ffn_down": f"{H}.1.DenseReluDense.wo.weight",
                    f"{L}.ffn_norm": f"{H}.1.layer_norm.weight"})
    for on, hn in inv.items():
        sd[f"text_encoder.{hn}"] = t5_ours[on]

    ckpt = tmp_path / "parler_ckpt"
    os.makedirs(ckpt)
    torch.save({k: torch.tensor(v) for k, v in sd.items()},
               ckpt / "pytorch_model.bin")
    config = {
        "decoder": {"num_hidden_layers": 2, "hidden_size": 64,
                    "num_attention_heads": 4, "num_codebooks": 9,
                    "vocab_size": 1088, "max_position_embeddings": 512,
                    "bos_token_id": 1025, "eos_token_id": 1024},
        "audio_encoder": {"codebook_size": 1024},
        "text_encoder": {"num_layers": 2, "d_model": 64, "num_heads": 1,
                         "vocab_size": 120, "eos_token_id": 1},
    }
    (ckpt / "config.json").write_text(json.dumps(config))
    vocab = [[t, -1.0] for t in kv["tokenizer.ggml.tokens"]]
    (ckpt / "tokenizer.json").write_text(json.dumps(
        {"model": {"type": "Unigram", "vocab": vocab, "unk_id": 0}}))

    out = str(tmp_path / "parler.gguf")
    from_hf.main(["parler", "--repo", str(ckpt), "--out", out,
                  "--conditional-prompt", "calm voice"])

    runner = runner_from_file(out)
    resp = runner.generate("hello", GenerationConfig(seed=0, max_tokens=16,
                                                     sample=False))
    assert np.isfinite(resp.audio).all()
    assert resp.timings["decode_steps"] > 0


def test_dia_converter_cli_offline(tmp_path):
    from tts_tpu.convert.builder_dia import build_dia_tensors
    from tts_tpu.convert import from_hf

    rng = np.random.default_rng(3)
    ours, kv = build_dia_tensors(rng)
    sd = {}
    hs = 16

    def qkv_inv(arr, hidden):    # ours [H*hs, hidden] -> torch (hidden, H, hs)
        return arr.T.reshape(hidden, -1, hs)

    def o_inv(arr, hidden):      # ours [hidden, H*hs] -> torch (H, hs, hidden)
        return arr.T.reshape(-1, hs, hidden)

    for side, layers, hidden in (("encoder", 2, 32), ("decoder", 2, 64)):
        base = f"dia.{side}"
        if side == "encoder":
            sd["encoder.embedding.weight"] = ours[f"{base}.embedding"]
        else:
            for i in range(9):
                sd[f"decoder.embeddings.{i}.weight"] = ours[f"{base}.embeddings.{i}"]
            heads_stack = np.stack([ours[f"{base}.heads.{i}"].T
                                    for i in range(9)], axis=1)
            sd["decoder.logits_dense.weight"] = heads_stack
        sd[f"{side}.norm.weight"] = ours[f"{base}.norm"]
        for i in range(layers):
            L = f"{base}.layers.{i}"
            t = f"{side}.layers.{i}"
            if side == "encoder":
                attn, pre = "self_attention", ""
            else:
                attn, pre = "self_attention", "self_"
            sd[f"{t}.{attn}.q_proj.weight"] = qkv_inv(ours[f"{L}.{pre}q_proj"], hidden)
            sd[f"{t}.{attn}.k_proj.weight"] = qkv_inv(ours[f"{L}.{pre}k_proj"], hidden)
            sd[f"{t}.{attn}.v_proj.weight"] = qkv_inv(ours[f"{L}.{pre}v_proj"], hidden)
            sd[f"{t}.{attn}.o_proj.weight"] = o_inv(ours[f"{L}.{pre}o_proj"], hidden)
            if side == "decoder":
                sd[f"{t}.cross_attention.q_proj.weight"] = qkv_inv(
                    ours[f"{L}.cross_q_proj"], hidden)
                sd[f"{t}.cross_attention.k_proj.weight"] = qkv_inv(
                    ours[f"{L}.cross_k_proj"], 32)
                sd[f"{t}.cross_attention.v_proj.weight"] = qkv_inv(
                    ours[f"{L}.cross_v_proj"], 32)
                sd[f"{t}.cross_attention.o_proj.weight"] = o_inv(
                    ours[f"{L}.cross_o_proj"], hidden)
                sd[f"{t}.pre_ca_norm.weight"] = ours[f"{L}.pre_ca_norm"]
                sd[f"{t}.pre_mlp_norm.weight"] = ours[f"{L}.pre_mlp_norm"]
                sd[f"{t}.pre_sa_norm.weight"] = ours[f"{L}.pre_sa_norm"]
            else:
                sd[f"{t}.pre_sa_norm.weight"] = ours[f"{L}.pre_sa_norm"]
                sd[f"{t}.post_sa_norm.weight"] = ours[f"{L}.post_sa_norm"]
            wi_fused = np.stack([ours[f"{L}.gate"].T, ours[f"{L}.up"].T], axis=1)
            sd[f"{t}.mlp.wi_fused.weight"] = wi_fused
            sd[f"{t}.mlp.wo.weight"] = ours[f"{L}.wo"].T

    ckpt = tmp_path / "dia_ckpt"
    os.makedirs(ckpt)
    torch.save({k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()},
               ckpt / "dia.pth")
    (ckpt / "config.json").write_text(json.dumps({
        "encoder_config": {"n_layer": 2, "n_embd": 32, "n_head": 4,
                           "head_dim": 16, "max_position_embeddings": 128},
        "decoder_config": {"n_layer": 2, "n_embd": 64, "gqa_query_heads": 4,
                           "kv_heads": 2},
    }))
    dac = tmp_path / "dac.pth"
    torch.save({k: torch.tensor(v)
                for k, v in _dac_torch_sd("", np.random.default_rng(4)).items()},
               dac)

    out = str(tmp_path / "dia.gguf")
    from_hf.main(["dia", "--repo", str(ckpt), "--out", out,
                  "--dac-path", str(dac)])

    runner = runner_from_file(out)
    resp = runner.generate("[S1] hi.", GenerationConfig(seed=0, max_tokens=24,
                                                        sample=False))
    assert np.isfinite(resp.audio).all()
    assert resp.timings["decode_steps"] > 0


def test_mapped_names_match_builder_layout():
    """The mapper outputs EXACTLY the tensor-name set our loaders consume
    (set-level structural parity with builder_parler/builder_dia)."""
    from tts_tpu.convert.builder_dia import build_dia_tensors
    from tts_tpu.convert import from_hf

    rng = np.random.default_rng(5)
    ours, _ = build_dia_tensors(rng)
    want = {n for n in ours if n.startswith("dia.")}

    # forward-map a synthetic torch sd built by the inverse mapping above and
    # check we land on the same names
    sd = {}
    hs = 16
    sd["encoder.embedding.weight"] = ours["dia.encoder.embedding"]
    sd["encoder.norm.weight"] = ours["dia.encoder.norm"]
    sd["decoder.norm.weight"] = ours["dia.decoder.norm"]
    for i in range(9):
        sd[f"decoder.embeddings.{i}.weight"] = ours[f"dia.decoder.embeddings.{i}"]
    sd["decoder.logits_dense.weight"] = np.stack(
        [ours[f"dia.decoder.heads.{i}"].T for i in range(9)], axis=1)
    for i in range(2):
        e = f"dia.encoder.layers.{i}"
        sd[f"encoder.layers.{i}.self_attention.q_proj.weight"] = \
            ours[f"{e}.q_proj"].T.reshape(32, -1, hs)
        sd[f"encoder.layers.{i}.self_attention.k_proj.weight"] = \
            ours[f"{e}.k_proj"].T.reshape(32, -1, hs)
        sd[f"encoder.layers.{i}.self_attention.v_proj.weight"] = \
            ours[f"{e}.v_proj"].T.reshape(32, -1, hs)
        sd[f"encoder.layers.{i}.self_attention.o_proj.weight"] = \
            ours[f"{e}.o_proj"].T.reshape(-1, hs, 32)
        sd[f"encoder.layers.{i}.pre_sa_norm.weight"] = ours[f"{e}.pre_sa_norm"]
        sd[f"encoder.layers.{i}.post_sa_norm.weight"] = ours[f"{e}.post_sa_norm"]
        sd[f"encoder.layers.{i}.mlp.wi_fused.weight"] = np.stack(
            [ours[f"{e}.gate"].T, ours[f"{e}.up"].T], axis=1)
        sd[f"encoder.layers.{i}.mlp.wo.weight"] = ours[f"{e}.wo"].T
        d = f"dia.decoder.layers.{i}"
        for p in ("q", "k", "v"):
            hid = 64 if p == "q" else 64
            sd[f"decoder.layers.{i}.self_attention.{p}_proj.weight"] = \
                ours[f"{d}.self_{p}_proj"].T.reshape(64, -1, hs)
            src_h = 64 if p == "q" else 32
            sd[f"decoder.layers.{i}.cross_attention.{p}_proj.weight"] = \
                ours[f"{d}.cross_{p}_proj"].T.reshape(src_h, -1, hs)
        sd[f"decoder.layers.{i}.self_attention.o_proj.weight"] = \
            ours[f"{d}.self_o_proj"].T.reshape(-1, hs, 64)
        sd[f"decoder.layers.{i}.cross_attention.o_proj.weight"] = \
            ours[f"{d}.cross_o_proj"].T.reshape(-1, hs, 64)
        for n in ("pre_sa_norm", "pre_ca_norm", "pre_mlp_norm"):
            sd[f"decoder.layers.{i}.{n}.weight"] = ours[f"{d}.{n}"]
        sd[f"decoder.layers.{i}.mlp.wi_fused.weight"] = np.stack(
            [ours[f"{d}.gate"].T, ours[f"{d}.up"].T], axis=1)
        sd[f"decoder.layers.{i}.mlp.wo.weight"] = ours[f"{d}.wo"].T

    mapped = from_hf.map_dia(sd)
    assert set(mapped) == want
    # and values round-trip (mapping inverts the inverse)
    for n in want:
        np.testing.assert_allclose(mapped[n], ours[n], atol=1e-6, err_msg=n)
