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


@pytest.mark.parametrize("n", [31, 33, 95, 4001])
def test_partial_block_dequant(rng, n):
    """n_elements not a multiple of 32 must not write past the output buffer
    (ADVICE r1: last-block writes were unbounded)."""
    pad = 32 * ((n + 31) // 32)
    x = rng.standard_normal(pad).astype(np.float32)
    for q, dq, ndq in [
        (quant.quantize_q8_0, quant.dequantize_q8_0, native.dequant_q8_0),
        (quant.quantize_q4_0, quant.dequantize_q4_0, native.dequant_q4_0),
        (quant.quantize_q5_0, quant.dequantize_q5_0, native.dequant_q5_0),
    ]:
        raw = np.frombuffer(q(x), np.uint8)
        np.testing.assert_array_equal(ndq(raw, n), dq(raw, n)[:n])


def test_quant_q8_subnormal_scale_matches_numpy(rng):
    """Blocks with absmax below the f16 normal range must encode a subnormal
    scale identical to numpy's astype(float16), not zero (ADVICE r1)."""
    x = (rng.standard_normal(256) * 5e-4).astype(np.float32)
    x[::32] = 4e-3  # absmax ~4e-3 -> d ~3.1e-5, an f16 subnormal
    got = np.frombuffer(native.quant_q8_0(x), np.uint8)
    ref = np.frombuffer(quant.quantize_q8_0(x), np.uint8)
    np.testing.assert_array_equal(got, ref)
    y = quant.dequantize_q8_0(got, x.size)
    assert np.abs(y).max() > 0


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
