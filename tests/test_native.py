"""Native codec library (ggufc) parity tests against the numpy reference."""

import numpy as np
import pytest

from tts_tpu.core import native, quant

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native ggufc library not built")


def test_q8_0_parity(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    raw = np.frombuffer(quant.quantize_q8_0(x), np.uint8)
    ref = quant.dequantize_q8_0(raw, x.size)
    got = native.dequant_q8_0(raw, x.size)
    np.testing.assert_array_equal(got, ref)


def test_q4_0_parity(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    raw = np.frombuffer(quant.quantize_q4_0(x), np.uint8)
    np.testing.assert_array_equal(native.dequant_q4_0(raw, x.size),
                                  quant.dequantize_q4_0(raw, x.size))


def test_q5_0_parity(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    raw = np.frombuffer(quant.quantize_q5_0(x), np.uint8)
    np.testing.assert_array_equal(native.dequant_q5_0(raw, x.size),
                                  quant.dequantize_q5_0(raw, x.size))


def test_f16_parity(rng):
    x = rng.standard_normal(5000).astype(np.float16)
    raw = np.frombuffer(x.tobytes(), np.uint8)
    got = native.f16_to_f32(raw, x.size)
    np.testing.assert_array_equal(got, x.astype(np.float32))


def test_native_quant_q8_roundtrip(rng):
    x = rng.standard_normal(2048).astype(np.float32)
    raw = native.quant_q8_0(x)
    y = quant.dequantize_q8_0(np.frombuffer(raw, np.uint8), x.size)
    np.testing.assert_allclose(x, y, atol=np.abs(x).max() / 127 + 1e-6)


def test_used_by_gguf_loader(tmp_path, rng):
    from tts_tpu.core.gguf import GGMLType, GGUFFile, GGUFWriter
    w = GGUFWriter(tmp_path / "n.gguf")
    w.add_kv("general.architecture", "dummy")
    x = rng.standard_normal((64, 64)).astype(np.float32)
    w.add_tensor("x", x, GGMLType.Q8_0)
    w.write()
    with GGUFFile(tmp_path / "n.gguf") as f:
        y = f.tensors["x"].to_numpy()
    np.testing.assert_allclose(x, y, atol=np.abs(x).max() / 127 + 1e-6)
