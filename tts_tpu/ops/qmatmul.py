"""Weights-quantized matmul: activations (f32/bf16) x int8 block-quantized
weights, dequantized on-chip — the TPU mapping for GGUF Q4_0/Q5_0/Q8_0
tensors (BASELINE north star: "Q4/Q5/Q8 quantized weights onto int8/int4 TPU
matmuls").

AR decode is weights-bandwidth-bound: reading int8 weights from HBM instead
of f32/bf16 halves/quarters the bytes per step.  The Pallas kernel streams
int8 tiles into VMEM, applies the per-32-row block scales, and feeds the MXU;
a pure-jnp fallback keeps CPU tests hermetic.

Layout: w_q int8 [K, N] with scales f32 [K//32, N] (GGML quantizes along the
input dimension; a GGUF [out, in] tensor transposes to this layout).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

QBLOCK = 32


def _pad_n(arr: np.ndarray, tile: int) -> np.ndarray:
    """Zero-pad the output (last) dim to a tile multiple so the Pallas kernel
    path applies — a ragged N (e.g. the 156,940-wide Orpheus lm_head) would
    otherwise silently fall back to a full dequantize-then-matmul every
    decode step.  Padded columns dequantize to 0; `linear` slices them off."""
    n = arr.shape[-1]
    pad = (-n) % tile
    if pad == 0:
        return arr
    return np.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(0, pad)])


def pack_q8_weight(tensor, pad_n: bool = False, tile_n: int = 256) -> dict:
    """GGUFTensor (Q8_0/Q4_0/Q5_0, shape [out, in]) -> {"wq": int8 [in, out],
    "scales": f32 [in//32, out]} for `quantized_matmul`.  `pad_n` tile-pads
    the output dim (caller must slice the result back; see the Orpheus head)."""
    values, scales = tensor.to_int8_scales()
    out_dim, in_dim = values.shape
    wq = np.ascontiguousarray(values.T)
    sc = np.ascontiguousarray(scales.reshape(out_dim, in_dim // QBLOCK).T)
    if pad_n:
        wq, sc = _pad_n(wq, tile_n), _pad_n(sc, tile_n)
    return {"wq": jnp.asarray(wq), "scales": jnp.asarray(sc)}


def _dequant_ref(wq, scales):
    K, N = wq.shape
    s = jnp.repeat(scales, QBLOCK, axis=0)        # [K, N]
    return wq.astype(jnp.float32) * s


def quantized_matmul_ref(x, wq, scales):
    """Reference path: dequantize then matmul (XLA fuses reasonably)."""
    return x.astype(jnp.float32) @ _dequant_ref(wq, scales)


def _qmm_kernel(x_ref, wq_ref, sc_ref, out_ref):
    """One [K, TILE_N] stripe: dequant in VMEM, single MXU dot."""
    x = x_ref[:].astype(jnp.float32)              # [M, K]
    wq = wq_ref[:]                                 # [K, TILE_N] int8
    sc = sc_ref[:]                                 # [K//32, TILE_N] f32
    K = wq.shape[0]
    w = wq.astype(jnp.float32) * jnp.repeat(sc, QBLOCK, axis=0)
    out_ref[:] = jnp.dot(x, w, preferred_element_type=jnp.float32)


def quantized_matmul(x, wq, scales, *, tile_n: int = 256, interpret: bool | None = None):
    """x [M, K] @ dequant(wq [K, N], scales [K//32, N]) -> [M, N] f32."""
    from jax.experimental import pallas as pl

    if x.ndim == 1:
        return quantized_matmul(x[None], wq, scales, tile_n=tile_n,
                                interpret=interpret)[0]
    M, K = x.shape
    Kw, N = wq.shape
    assert Kw == K and scales.shape == (K // QBLOCK, N)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if N % tile_n != 0:
        # ragged tail: fall back (weights are padded to tiles at load time in
        # the models, so this path is rare)
        return quantized_matmul_ref(x, wq, scales)

    grid = (N // tile_n,)
    return pl.pallas_call(
        _qmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((K, tile_n), lambda i: (0, i)),
            pl.BlockSpec((K // QBLOCK, tile_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((M, tile_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(x, wq, scales)


# ---------------------------------------------------------------------------
# int4-packed path (Q4_0): two 4-bit values per byte, HALF the HBM bytes of
# the int8 path — AR decode is weights-bandwidth-bound, so this is ~2x fewer
# weight bytes per step on Q4 checkpoints.
# Packing: packed[i, n] holds row i in the LOW nibble and row i + K/2 in the
# HIGH nibble (both signed 4-bit), so unpacking is a concat, not an interleave.
# ---------------------------------------------------------------------------

def pack_q4_nibbles(values: np.ndarray) -> np.ndarray:
    """int8 values in [-8, 7], shape [K, N] (K even) -> packed int8 [K//2, N]."""
    K = values.shape[0]
    assert K % 2 == 0
    lo = values[: K // 2].astype(np.int8)
    hi = values[K // 2 :].astype(np.int8)
    return ((hi.astype(np.uint8) << 4) | (lo.astype(np.uint8) & 0x0F)).astype(np.int8)


def pack_q4_weight(tensor, pad_n: bool = False, tile_n: int = 256) -> dict:
    """GGUFTensor (Q4_0, [out, in]) -> {"wq4": int8 [in//2, out],
    "scales": f32 [in//32, out]} for `quantized_matmul_q4`.  `pad_n` as in
    `pack_q8_weight`."""
    values, scales = tensor.to_int8_scales()
    out_dim, in_dim = values.shape
    packed = pack_q4_nibbles(np.ascontiguousarray(values.T))
    sc = np.ascontiguousarray(scales.reshape(out_dim, in_dim // QBLOCK).T)
    if pad_n:
        packed, sc = _pad_n(packed, tile_n), _pad_n(sc, tile_n)
    return {"wq4": jnp.asarray(packed), "scales": jnp.asarray(sc)}


def _unpack_nibbles_f32(p32):
    """packed (as int32) [K/2, N] -> (lo, hi) f32 values, Mosaic-friendly:
    mask + where for the low nibble; the int8->int32 conversion sign-extends
    the byte so an arithmetic >>4 yields the signed high nibble directly."""
    lo = p32 & 0xF
    lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.float32)
    hi = (p32 >> 4).astype(jnp.float32)
    return lo, hi


def _unpack_nibbles(p):
    """packed int8 [K/2, N] -> int8 values [K, N] (host/XLA fallback path)."""
    p32 = p.astype(jnp.int32)
    lo, hi = _unpack_nibbles_f32(p32)
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def _qmm4_kernel(x_ref, wq_ref, sc_ref, out_ref):
    """Two half-dots (rows 0..K/2 in the low nibble, K/2..K in the high one)
    — avoids concatenating along the sublane axis inside the kernel."""
    x = x_ref[:].astype(jnp.float32)                # [M, K]
    p32 = wq_ref[:].astype(jnp.int32)               # [K/2, TILE_N]
    lo, hi = _unpack_nibbles_f32(p32)
    sc = sc_ref[:]                                  # [K//32, TILE_N]
    K2 = p32.shape[0]
    half_blocks = K2 // QBLOCK
    sc_lo = jnp.repeat(sc[:half_blocks], QBLOCK, axis=0)
    sc_hi = jnp.repeat(sc[half_blocks:], QBLOCK, axis=0)
    out_ref[:] = (jnp.dot(x[:, :K2], lo * sc_lo,
                          preferred_element_type=jnp.float32)
                  + jnp.dot(x[:, K2:], hi * sc_hi,
                            preferred_element_type=jnp.float32))


def quantized_matmul_q4(x, wq4, scales, *, tile_n: int = 256,
                        interpret: bool | None = None):
    """x [M, K] @ dequant(packed wq4 [K//2, N], scales [K//32, N]) -> [M, N]."""
    from jax.experimental import pallas as pl

    if x.ndim == 1:
        return quantized_matmul_q4(x[None], wq4, scales, tile_n=tile_n,
                                   interpret=interpret)[0]
    M, K = x.shape
    Kh, N = wq4.shape
    assert Kh * 2 == K and scales.shape == (K // QBLOCK, N)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if N % tile_n != 0 or K % (2 * QBLOCK) != 0:
        # ragged tail / kernel's half-split needs K % 64 == 0: XLA fallback
        return x.astype(jnp.float32) @ (
            _unpack_nibbles(wq4).astype(jnp.float32)
            * jnp.repeat(scales, QBLOCK, axis=0))

    grid = (N // tile_n,)
    return pl.pallas_call(
        _qmm4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((Kh, tile_n), lambda i: (0, i)),
            pl.BlockSpec((K // QBLOCK, tile_n), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((M, tile_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(x, wq4, scales)


def linear(x, p):
    """Dense-or-quantized linear: p is {"w": [K, N]}, {"wq", "scales"} (int8)
    or {"wq4", "scales"} (packed int4).  A tile-padded weight (pad_n=True at
    pack time) returns padded columns — the caller slices them off with its
    static output size."""
    if "wq4" in p:
        return quantized_matmul_q4(x, p["wq4"], p["scales"])
    if "wq" in p:
        return quantized_matmul(x, p["wq"], p["scales"])
    return x @ p["w"].astype(x.dtype)
