"""GGUF reader/writer + quant codec roundtrip tests."""

import numpy as np
import pytest

from tts_tpu.core import quant
from tts_tpu.core.gguf import GGMLType, GGUFFile, GGUFWriter


def test_quant_roundtrip_q8_0(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    raw = quant.quantize_q8_0(x)
    y = quant.dequantize_q8_0(raw, x.size)
    # Q8_0: 8-bit symmetric, per-32 block scale -> tight tolerance
    np.testing.assert_allclose(x, y, atol=np.abs(x).max() / 127 + 1e-6)


@pytest.mark.parametrize("qfn,dqfn,bits", [
    (quant.quantize_q4_0, quant.dequantize_q4_0, 4),
    (quant.quantize_q5_0, quant.dequantize_q5_0, 5),
])
def test_quant_roundtrip_4_5(rng, qfn, dqfn, bits):
    x = rng.standard_normal(2048).astype(np.float32)
    raw = qfn(x)
    y = dqfn(raw, x.size)
    # block absmax / levels bound on the error
    xb = x.reshape(-1, 32)
    scale = np.abs(xb).max(axis=1, keepdims=True)
    err = np.abs((x - y).reshape(-1, 32))
    assert (err <= scale / (2 ** (bits - 1)) * 1.01 + 1e-6).all()


def test_q8_int8_view_matches_dequant(rng):
    x = rng.standard_normal(1024).astype(np.float32)
    raw = quant.quantize_q8_0(x)
    v, s = quant.q8_0_to_int8_scales(raw, x.size)
    y = (v.reshape(-1, 32).astype(np.float32) * s[:, None]).reshape(-1)
    np.testing.assert_allclose(y, quant.dequantize_q8_0(raw, x.size), rtol=0, atol=0)


def test_gguf_roundtrip(tmp_path, rng):
    path = tmp_path / "test.gguf"
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "dummy")
    w.add_kv("dummy.n_layers", 7)
    w.add_kv("dummy.scale", 0.5)
    w.add_kv("dummy.flag", True)
    w.add_kv("tokenizer.ggml.tokens", ["a", "b", "▁c"])
    w.add_kv("tokenizer.ggml.scores", np.array([0.0, -1.5, -2.0], np.float32))
    a = rng.standard_normal((17, 64)).astype(np.float32)
    b = rng.standard_normal((8, 32)).astype(np.float32)
    c = rng.standard_normal((4, 4, 96)).astype(np.float32)
    ids = np.arange(10, dtype=np.int32)
    w.add_tensor("a.weight", a)
    w.add_tensor("b.weight", b, GGMLType.F16)
    w.add_tensor("c.weight", c, GGMLType.Q8_0)
    w.add_tensor("ids", ids)
    w.write()

    with GGUFFile(path) as f:
        assert f.architecture == "dummy"
        assert f.kv["dummy.n_layers"] == 7
        assert f.kv["dummy.scale"] == pytest.approx(0.5)
        assert f.kv["dummy.flag"] is True
        assert f.kv["tokenizer.ggml.tokens"] == ["a", "b", "▁c"]
        np.testing.assert_allclose(f.kv["tokenizer.ggml.scores"],
                                   [0.0, -1.5, -2.0])
        assert f.tensors["a.weight"].shape == (17, 64)
        np.testing.assert_array_equal(f.tensors["a.weight"].to_numpy(), a)
        np.testing.assert_allclose(f.tensors["b.weight"].to_numpy(), b, atol=2e-3)
        t = f.tensors["c.weight"]
        assert t.ggml_type == GGMLType.Q8_0
        assert t.shape == (4, 4, 96)
        np.testing.assert_allclose(t.to_numpy(), c, atol=np.abs(c).max() / 127 + 1e-6)
        np.testing.assert_array_equal(f.tensors["ids"].to_numpy(np.int32), ids)


def test_gguf_bf16(tmp_path, rng):
    path = tmp_path / "bf16.gguf"
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "dummy")
    x = rng.standard_normal((16, 16)).astype(np.float32)
    w.add_tensor("x", x, GGMLType.BF16)
    w.write()
    with GGUFFile(path) as f:
        y = f.tensors["x"].to_numpy()
        np.testing.assert_allclose(x, y, rtol=8e-3)
