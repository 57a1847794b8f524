"""Quantized matmul kernel tests (Pallas interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tts_tpu.core import quant
from tts_tpu.ops.qmatmul import (
    QBLOCK, linear, pack_q8_weight, quantized_matmul, quantized_matmul_ref,
)


def make_q8(rng, out_dim, in_dim):
    w = rng.standard_normal((out_dim, in_dim)).astype(np.float32)
    raw = quant.quantize_q8_0(w)
    values, scales = quant.q8_0_to_int8_scales(np.frombuffer(raw, np.uint8),
                                               w.size)
    wq = jnp.asarray(values.reshape(out_dim, in_dim).T.copy())
    sc = jnp.asarray(scales.reshape(out_dim, in_dim // QBLOCK).T.copy())
    wd = quant.dequantize_q8_0(np.frombuffer(raw, np.uint8), w.size).reshape(out_dim, in_dim)
    return wq, sc, wd


def test_ref_matches_dequant(rng):
    wq, sc, wd = make_q8(rng, 64, 96)
    x = rng.standard_normal((4, 96)).astype(np.float32)
    got = np.asarray(quantized_matmul_ref(jnp.asarray(x), wq, sc))
    want = x @ wd.T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_pallas_kernel_matches_ref(rng):
    wq, sc, wd = make_q8(rng, 256, 128)
    x = rng.standard_normal((2, 128)).astype(np.float32)
    got = np.asarray(quantized_matmul(jnp.asarray(x), wq, sc, tile_n=128,
                                      interpret=True))
    want = np.asarray(quantized_matmul_ref(jnp.asarray(x), wq, sc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_vector_input(rng):
    wq, sc, _ = make_q8(rng, 256, 64)
    x = rng.standard_normal(64).astype(np.float32)
    got = quantized_matmul(jnp.asarray(x), wq, sc, tile_n=128, interpret=True)
    assert got.shape == (256,)


def test_ragged_tail_fallback(rng):
    wq, sc, _ = make_q8(rng, 100, 64)   # N=100 not divisible by tile
    x = rng.standard_normal((3, 64)).astype(np.float32)
    got = np.asarray(quantized_matmul(jnp.asarray(x), wq, sc, tile_n=256))
    want = np.asarray(quantized_matmul_ref(jnp.asarray(x), wq, sc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_linear_dispatch(rng):
    wq, sc, wd = make_q8(rng, 128, 64)
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    dense = linear(x, {"w": jnp.asarray(wd.T)})
    quantized = linear(x, {"wq": wq, "scales": sc})
    np.testing.assert_allclose(np.asarray(dense), np.asarray(quantized),
                               rtol=1e-4, atol=1e-3)


def test_pack_q8_weight(tmp_path, rng):
    from tts_tpu.core.gguf import GGMLType, GGUFFile, GGUFWriter
    w = rng.standard_normal((64, 96)).astype(np.float32)
    wr = GGUFWriter(tmp_path / "q.gguf")
    wr.add_kv("general.architecture", "dummy")
    wr.add_tensor("w", w, GGMLType.Q8_0)
    wr.write()
    with GGUFFile(tmp_path / "q.gguf") as f:
        p = pack_q8_weight(f.tensors["w"])
        wd = f.tensors["w"].to_numpy()
    x = jnp.asarray(rng.standard_normal((2, 96)).astype(np.float32))
    got = np.asarray(linear(x, p))
    want = x @ wd.T
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-3)


def test_f16_bits_decode_exact(rng):
    """uint16 raw-f16-bit scales decode to f32 EXACTLY (incl. subnormals,
    +-0) — the production scale layout adds no error over the GGUF f16 `d`."""
    from tts_tpu.ops.qmatmul import _f16_bits_to_f32, _scales_f32

    vals = np.concatenate([
        rng.standard_normal(256).astype(np.float16),
        (rng.standard_normal(64) * 1e-7).astype(np.float16),   # subnormals
        np.asarray([0.0, -0.0, 6.1e-5, -5.96e-8, 65504.0], np.float16),
    ])
    bits = jnp.asarray(vals.view(np.uint16).reshape(1, -1))
    got = np.asarray(_f16_bits_to_f32(bits))[0]
    np.testing.assert_array_equal(got, vals.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(_scales_f32(bits))[0],
                                  vals.astype(np.float32))


def test_pack_scales_roundtrip(rng):
    """pack_q8_weight's uint16 scales reproduce the f32 dequant exactly."""
    wq, sc, wd = make_q8(rng, 64, 96)
    from tts_tpu.ops.qmatmul import _pack_scales, _scales_f32
    packed = jnp.asarray(_pack_scales(np.asarray(sc)))
    assert packed.dtype == jnp.uint16
    np.testing.assert_array_equal(np.asarray(_scales_f32(packed)),
                                  np.asarray(sc))


def test_qmv_decode_path_matches_ref(rng):
    """M == 1 block-diagonal decode kernel == ref, incl. multi-K-chunk
    accumulation (K=4096 forces kt=2048 -> 2 chunks under the VMEM budget)."""
    from tts_tpu.ops.qmatmul import _pick_tiles

    for K, N in [(512, 512), (4096, 1024)]:
        wq = jnp.asarray(rng.integers(-127, 127, (K, N)).astype(np.int8))
        sc = jnp.asarray((rng.random((K // QBLOCK, N)) * 0.02 + 1e-3)
                         .astype(np.float32))
        x = rng.standard_normal((1, K)).astype(np.float32)
        assert _pick_tiles(K, N) is not None   # the decode path is taken
        got = np.asarray(quantized_matmul(jnp.asarray(x), wq, sc,
                                          interpret=True))
        want = np.asarray(quantized_matmul_ref(
            jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32), wq, sc))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_qmv4_decode_path_matches_unpacked(rng):
    """M == 1 int4 decode kernel == int8 path on the same values, incl. the
    high-nibble scale offset across multiple packed-K chunks."""
    from tts_tpu.ops.qmatmul import (
        _pick_tiles, pack_q4_nibbles, quantized_matmul_q4)

    for K, N in [(1024, 1024), (4096, 1024)]:
        vals = rng.integers(-8, 8, (K, N)).astype(np.int8)
        sc = (rng.random((K // QBLOCK, N)) * 0.02 + 1e-3).astype(np.float32)
        x = rng.standard_normal((1, K)).astype(np.float32)
        assert _pick_tiles(K // 2, N, max_bytes=1 << 20) is not None
        got = np.asarray(quantized_matmul_q4(
            jnp.asarray(x), jnp.asarray(pack_q4_nibbles(vals)),
            jnp.asarray(sc), interpret=True))
        xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16)
                        .astype(jnp.float32))
        want = xb @ (vals.astype(np.float32) * np.repeat(sc, QBLOCK, axis=0))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("M", [2, 3, 8])
def test_qmv_small_m_matches_ref(rng, M):
    """M > 1 block-diagonal decode kernel == ref (kernel kept testable via
    `block_diag_m_cap`; production default is cap=1 — the round-4 A/B
    measured the M <= 8 extension slower at every M > 1), incl. multi-K-chunk
    accumulation and the M-aware K-chunk cap."""
    from tts_tpu.ops.qmatmul import _pick_tiles

    for K, N in [(512, 512), (4096, 1024)]:
        wq = jnp.asarray(rng.integers(-127, 127, (K, N)).astype(np.int8))
        sc = jnp.asarray((rng.random((K // QBLOCK, N)) * 0.02 + 1e-3)
                         .astype(np.float32))
        x = rng.standard_normal((M, K)).astype(np.float32)
        assert _pick_tiles(K, N, M=M) is not None   # the decode path is taken
        got = np.asarray(quantized_matmul(jnp.asarray(x), wq, sc,
                                          interpret=True, block_diag_m_cap=8))
        want = np.asarray(quantized_matmul_ref(
            jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32), wq, sc))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
        # the production default (cap=1) routes M > 1 through the whole-K
        # kernel — full f32 activations, so it matches the f32 ref TIGHTER
        got_def = np.asarray(quantized_matmul(jnp.asarray(x), wq, sc,
                                              interpret=True))
        want_f32 = np.asarray(quantized_matmul_ref(jnp.asarray(x), wq, sc))
        np.testing.assert_allclose(got_def, want_f32, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("M", [2, 5])
def test_qmv4_small_m_matches_unpacked(rng, M):
    """M > 1 int4 block-diagonal kernel == dequantized matmul on the same
    values (kernel kept testable via `block_diag_m_cap`; default cap=1)."""
    from tts_tpu.ops.qmatmul import (
        _pick_tiles, pack_q4_nibbles, quantized_matmul_q4)

    for K, N in [(1024, 1024), (4096, 1024)]:
        vals = rng.integers(-8, 8, (K, N)).astype(np.int8)
        sc = (rng.random((K // QBLOCK, N)) * 0.02 + 1e-3).astype(np.float32)
        x = rng.standard_normal((M, K)).astype(np.float32)
        assert _pick_tiles(K // 2, N, max_bytes=1 << 20, M=M) is not None
        got = np.asarray(quantized_matmul_q4(
            jnp.asarray(x), jnp.asarray(pack_q4_nibbles(vals)),
            jnp.asarray(sc), interpret=True, block_diag_m_cap=8))
        xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16)
                        .astype(jnp.float32))
        want = xb @ (vals.astype(np.float32) * np.repeat(sc, QBLOCK, axis=0))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_q4_packed_matmul_matches_int8(rng):
    """int4 nibble-packed matmul == int8 path on the same Q4 values."""
    import numpy as np
    import jax.numpy as jnp
    from tts_tpu.ops.qmatmul import (
        pack_q4_nibbles, quantized_matmul, quantized_matmul_q4)

    K, N, M = 64, 512, 4
    vals = rng.integers(-8, 8, (K, N)).astype(np.int8)
    scales = (rng.random((K // 32, N)) * 0.02 + 0.001).astype(np.float32)
    x = rng.standard_normal((M, K)).astype(np.float32)
    a = np.asarray(quantized_matmul(jnp.asarray(x), jnp.asarray(vals),
                                    jnp.asarray(scales)))
    packed = pack_q4_nibbles(vals)
    assert packed.shape == (K // 2, N)
    b = np.asarray(quantized_matmul_q4(jnp.asarray(x), jnp.asarray(packed),
                                       jnp.asarray(scales)))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    # ragged-tail fallback path too
    c = np.asarray(quantized_matmul_q4(jnp.asarray(x), jnp.asarray(packed),
                                       jnp.asarray(scales), tile_n=500))
    np.testing.assert_allclose(a, c, rtol=1e-6, atol=1e-6)


def test_auto_tile_n_vmem_rules():
    """The whole-K auto N-tile (r5 qmatmul_chain probe) must stay at 256
    for prefill-sized M: dia_cross_kv (M=2048, Kh=512, N=2048) OOMed
    scoped vmem at tn=512 because x [M, K] + out [M, tn] stay resident."""
    from tts_tpu.ops.qmatmul import _auto_tile_n

    # decode-sized M gets the probe-backed wider tiles
    assert _auto_tile_n(1536, 5120, M=1) == 512        # orpheus qkv (q4)
    assert _auto_tile_n(1536, 157696, M=9) == 1024     # padded lm_head
    assert _auto_tile_n(4096, 3072, M=1) == 256        # down: 512*4096 = 2 MB
    # prefill / cross-KV M keeps 256 regardless of shape
    assert _auto_tile_n(512, 2048, M=2048) == 256      # dia_cross_kv repro
    assert _auto_tile_n(1536, 5120, M=64) == 256
