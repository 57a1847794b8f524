"""Quantize app tests: GGUF -> GGUF roundtrip, allowlists, model still loads."""

import numpy as np
import pytest

from tts_tpu.apps.quantize import QuantizationParams, quantize_gguf
from tts_tpu.core.gguf import GGMLType, GGUFFile
from tts_tpu.convert.builder_kokoro import KokoroDims, write_kokoro_gguf
from tts_tpu.models.registry import runner_from_file
from tts_tpu.runtime.api import GenerationConfig


@pytest.fixture(scope="module")
def kokoro_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("q") / "kokoro.gguf"
    # dims divisible by 32 so albert tensors are quantizable
    write_kokoro_gguf(path, KokoroDims.tiny(), seed=0)
    return str(path)


def test_quantize_q8(kokoro_path, tmp_path):
    out = tmp_path / "kokoro_q8.gguf"
    stats = quantize_gguf(kokoro_path, str(out), QuantizationParams(GGMLType.Q8_0))
    assert stats["quantized"] > 0
    assert stats["passthrough"] > 0
    with GGUFFile(str(out)) as f:
        assert f.architecture == "kokoro"
        # albert attention weights should be quantized
        assert f.tensors["kokoro.albert.layer.0.q"].ggml_type == GGMLType.Q8_0
        # voice tensors never quantized
        assert f.tensors["kokoro.voice_tensors.af_heart"].ggml_type == GGMLType.F32
        # alphas/norms preserved
        assert f.tensors["kokoro.albert.norm"].ggml_type == GGMLType.F32


def test_quantized_model_loads_and_runs(kokoro_path, tmp_path):
    out = tmp_path / "kokoro_q5.gguf"
    quantize_gguf(kokoro_path, str(out), QuantizationParams(GGMLType.Q8_0))
    runner = runner_from_file(str(out))
    resp = runner.generate("hello", GenerationConfig(voice="af_heart"))
    assert np.isfinite(resp.audio).all()
    assert len(resp.audio) > 0


def test_quantize_preserves_kv(kokoro_path, tmp_path):
    out = tmp_path / "kokoro_f16.gguf"
    quantize_gguf(kokoro_path, str(out),
                  QuantizationParams(GGMLType.F16, convert_non_quantized_to_f16=True))
    with GGUFFile(str(out)) as f:
        with GGUFFile(kokoro_path) as orig:
            assert f.kv["kokoro.voices"] == orig.kv["kokoro.voices"]
            assert f.kv["tokenizer.ggml.tokens"] == orig.kv["tokenizer.ggml.tokens"]


@pytest.mark.parametrize("qtype", [GGMLType.Q8_0, GGMLType.Q5_0, GGMLType.Q4_0])
def test_orpheus_quantize_roundtrip(tmp_path, qtype):
    """Quantize an Orpheus GGUF and generate: linears stay int8 on device for
    Q8/Q5/Q4 and greedy audio correlates with the f32 model."""
    from tts_tpu.convert.builder_orpheus import write_orpheus_gguf

    src = tmp_path / "orpheus.gguf"
    write_orpheus_gguf(src, hidden=64, head_dim=16)
    dst = tmp_path / f"orpheus_{qtype.name}.gguf"
    stats = quantize_gguf(str(src), str(dst), QuantizationParams(qtype))
    assert stats["quantized"] > 0
    cfg = GenerationConfig(seed=0, max_tokens=15, voice="zoe", sample=False)
    ref = runner_from_file(str(src)).generate("hi", cfg)
    runner = runner_from_file(str(dst))
    # tiny linears are %32 in-dim -> quantized dict params: Q4 packs to int4
    # nibbles ("wq4"), Q8/Q5 stay int8 ("wq"); uniform-format q/k/v fuse into
    # one "qkv" launch
    qp = runner.params["layers"][0]["qkv"]
    qkey = "wq4" if qtype == GGMLType.Q4_0 else "wq"
    assert qkey in qp and qp[qkey].dtype.name == "int8"
    assert "gateup" in runner.params["layers"][0]
    resp = runner.generate("hi", cfg)
    assert np.isfinite(resp.audio).all()
    n = min(len(resp.audio), len(ref.audio))
    assert n > 0
    corr = np.corrcoef(resp.audio[:n], ref.audio[:n])[0, 1]
    assert corr > 0.95, f"{qtype.name} audio decorrelated from f32 (corr={corr:.3f})"
