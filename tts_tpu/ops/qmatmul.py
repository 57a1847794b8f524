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


import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

QBLOCK = 32


def _default_m_cap() -> int:
    """Module default for `block_diag_m_cap`, env-overridable for on-TPU
    A/Bs (TTS_TPU_BLOCKDIAG_CAP=0 routes every M through the whole-K
    kernels).  Read at trace time only — zero per-step cost."""
    return int(os.environ.get("TTS_TPU_BLOCKDIAG_CAP", "1"))


def _block_diag_k_ok(K: int) -> bool:
    """Env-gated K ceiling for the block-diagonal path
    (TTS_TPU_BLOCKDIAG_K_CAP=<K>, 0/unset = no ceiling): the round-5
    qmatmul_chain probe measured the M=1 block-diag kernel at 168 GB/s on
    the K=8192 down projection vs 425 GB/s whole-K — this knob lets the
    model-level A/B route ONLY big-K shapes to whole-K."""
    cap = int(os.environ.get("TTS_TPU_BLOCKDIAG_K_CAP", "0"))
    return cap == 0 or K <= cap


def _auto_tile_n(k_bytes: int, N: int, M: int = 1) -> int:
    """Whole-K kernel N-tile when the caller didn't pass one, from the
    round-5 qmatmul_chain probe (tools/README.md): tn=512 beats 256 by
    ~10-20% on qkv/gateup-shaped stripes while the weight block
    (k_bytes * tn) stays <= 1 MB (down at 2 MB regressed); very wide
    outputs (the 157k lm_head) are fastest at tn=1024 (587 vs 694 us,
    weight block 1.5 MB).  Decode-sized M only: at prefill/cross-KV M
    (hundreds-plus) the resident x [M, K] + out [M, tn] f32 leave no VMEM
    headroom for wider weight tiles (dia_cross_kv at M=2048 tn=512 OOMed
    scoped vmem by 0.5 MB), so large M keeps the proven 256."""
    if M > 16:
        return 256
    if N >= 65536 and N % 1024 == 0 and k_bytes * 1024 <= (1 << 21):
        return 1024
    if N % 512 == 0 and k_bytes * 512 <= (1 << 20):
        return 512
    return 256


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
    "scales": uint16 [in//32, out]} for `quantized_matmul`.  Scales ship as
    their RAW f16 bit patterns — the GGUF block `d` IS f16, so this is exact
    (the int8 view adds no error beyond the quantization itself) and halves
    the scale bytes streamed per decode step (~190 MB/step on the 3B vs
    f32).  Mosaic rejects f16 operands, so the kernels decode the bits with
    integer ops (`_f16_bits_to_f32`).  `pad_n` tile-pads the output dim
    (caller must slice the result back; see the Orpheus head)."""
    values, scales = tensor.to_int8_scales()
    out_dim, in_dim = values.shape
    wq = np.ascontiguousarray(values.T)
    sc = _pack_scales(scales.reshape(out_dim, in_dim // QBLOCK).T)
    if pad_n:
        wq, sc = _pad_n(wq, tile_n), _pad_n(sc, tile_n)
    return {"wq": jnp.asarray(wq), "scales": jnp.asarray(sc)}


def _pack_scales(scales: np.ndarray) -> np.ndarray:
    """f32 scales (exact f16 round-trips — GGUF stores `d` as f16) -> their
    raw f16 bit patterns as uint16: half the HBM bytes, zero precision loss."""
    return np.ascontiguousarray(scales).astype(np.float16).view(np.uint16)


def _f16_bits_to_f32(sc):
    """uint16 f16 bit patterns -> f32, exact, using only integer ops +
    bitcast (Mosaic rejects f16 typed operands).  Subnormal encodings
    (absmax < ~6e-5 blocks) decode correctly; inf/nan never occur in
    quantization scales."""
    b = sc.astype(jnp.int32) & 0xFFFF
    sign = (b & 0x8000) << 16
    exp = (b >> 10) & 0x1F
    man = b & 0x3FF
    normal = jax.lax.bitcast_convert_type(
        sign | ((exp + 112) << 23) | (man << 13), jnp.float32)
    sub = jnp.where(sign != 0, -1.0, 1.0) * man.astype(jnp.float32) * (2.0 ** -24)
    return jnp.where(exp == 0, sub, normal)


def _scales_f32(scales):
    """Decode scales to f32 wherever they're consumed: uint16 = raw f16 bits
    (production layout), anything else = a float array (tests, ad-hoc use)."""
    if scales.dtype == jnp.uint16:
        return _f16_bits_to_f32(scales)
    return scales.astype(jnp.float32)


def _dequant_ref(wq, scales):
    K, N = wq.shape
    s = jnp.repeat(_scales_f32(scales), QBLOCK, axis=0)        # [K, N]
    return wq.astype(jnp.float32) * s


def quantized_matmul_ref(x, wq, scales):
    """Reference path: dequantize then matmul (XLA fuses reasonably)."""
    return x.astype(jnp.float32) @ _dequant_ref(wq, scales)


def _qmm_kernel(x_ref, wq_ref, sc_ref, out_ref):
    """One [K, TILE_N] stripe: dequant in VMEM, single MXU dot."""
    x = x_ref[:].astype(jnp.float32)              # [M, K]
    wq = wq_ref[:]                                 # [K, TILE_N] int8
    sc = _scales_f32(sc_ref[:])                    # [K//32, TILE_N]
    K = wq.shape[0]
    w = wq.astype(jnp.float32) * jnp.repeat(sc, QBLOCK, axis=0)
    out_ref[:] = jnp.dot(x, w, preferred_element_type=jnp.float32)


def _qmv_kernel(xd_ref, wq_ref, sc_ref, out_ref):
    """Decode (small-M) stripe, restructured to keep the VPU off the critical
    path: the per-32-block scale structure moves into the dot's M dimension.

    `xd` is the block-diagonal expansion of the activation rows — for each of
    the M rows, xd[b*M + m, k] = x[m, k] when k is in scale block b, else 0 —
    so ONE MXU matmul produces all per-(row, block) partial sums
    p[b*M + m, n] (M * K/32 rows ride the same systolic passes a single row
    would), and the group scales apply at [K/32, TILE] granularity: ~M/16 VPU
    ops per weight instead of ~3 (dequant-into-f32 was VPU-bound at 3B
    weights/step; this keeps the kernel HBM-bound).  The only per-weight op
    left is the int8->bf16 convert feeding the MXU (int8 values are exact in
    bf16's 8-bit mantissa).  Rows are block-major (m fastest) so a K chunk
    reads a CONTIGUOUS row range of xd.

    The kernel still handles M > 1 (used by tests / `_pick_tiles`-driven
    experiments), but production callers route only M == 1 here: the M <= 8
    extension was measured slower than the whole-K `_qmm_kernel` at every
    M > 1 (round-4 A/B, see `quantized_matmul`).

    Grid is (N tiles, K chunks) with K innermost: the output tile stays
    resident while partial sums accumulate, and the K chunking keeps the
    double-buffered weight tiles inside the ~16 MB VMEM budget for large K."""
    from jax.experimental import pallas as pl

    i_k = pl.program_id(1)
    M = out_ref.shape[0]
    xd = xd_ref[:]                          # [M * KT//32, KT] bf16 (diag chunk)
    w = wq_ref[:].astype(jnp.bfloat16)      # [KT, TILE_N]
    p = jnp.dot(xd, w, preferred_element_type=jnp.float32)  # [M*KT//32, TILE_N]
    sc = _scales_f32(sc_ref[:])                             # [KT//32, TILE_N]
    if M == 1:
        part = jnp.sum(p * sc, axis=0, keepdims=True)
    else:
        bpc = p.shape[0] // M
        p = p.reshape(bpc, M, p.shape[1])
        part = jnp.sum(p * sc[:, None, :], axis=0)          # [M, TILE_N]

    @pl.when(i_k == 0)
    def _init():
        out_ref[:] = part

    @pl.when(i_k > 0)
    def _acc():
        out_ref[:] = out_ref[:] + part


def _block_diag_x(x, kt: int | None = None):
    """[M, K] -> [M * K//32, kt] bf16: row b*M + m holds x[m]'s scale-block b
    in its 32-wide window within b's K-chunk of width `kt` (kt == K gives the
    plain block-diagonal).  Rows are block-major so chunk i of the kernel
    grid reads the CONTIGUOUS rows [i*M*kt/32, (i+1)*M*kt/32)."""
    M, K = x.shape
    if kt is None:
        kt = K
    B, bpc = K // QBLOCK, kt // QBLOCK
    cols = jnp.arange(kt, dtype=jnp.int32)[None, :] // QBLOCK    # [1, kt]
    rows = jnp.arange(B, dtype=jnp.int32)[:, None] % bpc         # [B, 1]
    xr = x.reshape(M, K // kt, kt)                               # [M, C, kt]
    xr = jnp.repeat(xr, bpc, axis=1)                             # [M, B, kt]
    xd = jnp.where(cols[None] == rows[None], xr.astype(jnp.bfloat16), 0)
    # -> block-major rows: [B, M, kt] -> [B*M, kt]
    return xd.transpose(1, 0, 2).reshape(B * M, kt)


def _pick_tiles(K: int, N: int, max_bytes: int = 1 << 21, M: int = 1,
                macs_cap: int = 4096):
    """(kt, tn) for the M=1 decode kernels: both divide their dims, and BOTH
    the weight tile (kt*tn bytes) and the block-diagonal activation tile
    (kt^2/16 bytes bf16, see `_block_diag_x`) stay under `max_bytes` so
    Pallas double-buffering fits VMEM.

    The expansion does M*kt/32 MACs per weight ELEMENT; v5e break-even is
    ~118 MACs per weight BYTE (197 TFLOP/s bf16 vs 819 GB/s).  `macs_cap`
    bounds M*kt: int8 (1 B/elem) takes the default 4096 (~128 MACs/B); int4
    (0.5 B/elem) must pass 2048.  (This was the mechanism behind the failed
    M<=8 extension: at M>1 the cap shrinks K chunks so much the grid
    overhead beats the whole-K fallback kernel — measured round 4, callers
    now use the expansion only at M=1.)"""
    tn = next((t for t in (1024, 512, 256) if N % t == 0), None)
    if tn is None:
        return None
    kt_cap = 8192 if M == 1 else max(macs_cap // M, 256)
    for kt in (8192, 6144, 4096, 3072, 2048, 1536, 1024, 512, 256):
        if (kt <= min(K, kt_cap) and K % kt == 0 and kt * tn <= max_bytes
                and M * kt * kt // 16 <= max_bytes):
            return kt, tn
    return None


def quantized_matmul(x, wq, scales, *, tile_n: int | None = None,
                     interpret: bool | None = None,
                     block_diag_m_cap: int | None = None):
    """x [M, K] @ dequant(wq [K, N], scales [K//32, N]) -> [M, N] f32.

    `block_diag_m_cap` routes M <= cap through the block-diagonal decode
    kernel; the default (env TTS_TPU_BLOCKDIAG_CAP, normally 1) is the
    measured-optimal config (round-4 A/B — see below).  Tests/experiments
    may raise it to exercise the M > 1 kernel.  `tile_n=None` picks the
    whole-K N tile per shape (`_auto_tile_n`)."""
    from jax.experimental import pallas as pl

    if x.ndim == 1:
        return quantized_matmul(x[None], wq, scales, tile_n=tile_n,
                                interpret=interpret,
                                block_diag_m_cap=block_diag_m_cap)[0]
    M, K = x.shape
    Kw, N = wq.shape
    assert Kw == K and scales.shape == (K // QBLOCK, N)
    if block_diag_m_cap is None:
        block_diag_m_cap = _default_m_cap()
    if tile_n is None:
        tile_n = _auto_tile_n(K, N, M)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if N % tile_n != 0:
        # ragged tail: fall back (weights are padded to tiles at load time in
        # the models, so this path is rare)
        return quantized_matmul_ref(x, wq, scales)

    # decode fast path, M == 1 ONLY: the K/32 partial-sum rows ride the MXU
    # almost for free and the kernel streams weights at HBM peak
    # (tools/qmatmul_bw.py).  Extending the expansion to M <= 8 was built in
    # round 3 and MEASURED SLOWER on-TPU in round 4 — Dia CFG M=2 Q4:
    # 281 vs 335 steps/s; Parler 426 vs 437; Orpheus spec verify M=8:
    # 449 vs 517 tok/s — the M-fold activation expansion + shrunken K chunks
    # cost more than the whole-K `_qmm_kernel` below, so M > 1 takes that
    # path (measured -> reverted, VERDICT r3 item 2c).
    tiles = (_pick_tiles(K, N, M=M)
             if M <= block_diag_m_cap and _block_diag_k_ok(K) else None)
    if tiles is not None:
        kt, tn = tiles
        return pl.pallas_call(
            _qmv_kernel,
            grid=(N // tn, K // kt),
            in_specs=[
                pl.BlockSpec((M * kt // QBLOCK, kt), lambda j, i: (i, 0)),
                pl.BlockSpec((kt, tn), lambda j, i: (i, j)),
                pl.BlockSpec((kt // QBLOCK, tn), lambda j, i: (i, j)),
            ],
            out_specs=pl.BlockSpec((M, tn), lambda j, i: (0, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            interpret=interpret,
        )(_block_diag_x(x, kt), wq, scales)
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
    "scales": uint16 raw f16 bits [in//32, out]} for `quantized_matmul_q4`
    (same exact scale encoding as `pack_q8_weight`).  `pad_n` as there."""
    values, scales = tensor.to_int8_scales()
    out_dim, in_dim = values.shape
    packed = pack_q4_nibbles(np.ascontiguousarray(values.T))
    sc = _pack_scales(scales.reshape(out_dim, in_dim // QBLOCK).T)
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
    sc = _scales_f32(sc_ref[:])                     # [K//32, TILE_N]
    K2 = p32.shape[0]
    half_blocks = K2 // QBLOCK
    sc_lo = jnp.repeat(sc[:half_blocks], QBLOCK, axis=0)
    sc_hi = jnp.repeat(sc[half_blocks:], QBLOCK, axis=0)
    out_ref[:] = (jnp.dot(x[:, :K2], lo * sc_lo,
                          preferred_element_type=jnp.float32)
                  + jnp.dot(x[:, K2:], hi * sc_hi,
                            preferred_element_type=jnp.float32))


def _qmv4_kernel(xdlo_ref, xdhi_ref, sclo_ref, schi_ref, wq_ref, out_ref):
    """Decode (small-M) int4 stripe with the block-diag restructure of
    `_qmv_kernel`: per-nibble-plane block-diag activations -> two MXU dots ->
    group scales applied at [K/32, TILE] granularity.  VPU work is the nibble
    unpack + bf16 convert (~3 ops/weight), overlapped with the HBM stream.
    M > 1 rows stack block-major exactly as in `_qmv_kernel`.

    Grid is (N tiles, packed-K chunks) with K innermost (accumulating output
    tile).  Chunking also bounds the block-diag MXU waste, which grows with
    the dot's K width.  A packed chunk holds original rows [c*kth, c*kth+kth)
    in the low nibble and the same range offset by K/2 in the high nibble, so
    the SAME scales array is passed twice with index maps offset by K/(2*kth)
    chunk-rows — no special scale layout needed."""
    from jax.experimental import pallas as pl

    i_k = pl.program_id(1)
    M = out_ref.shape[0]
    p32 = wq_ref[:].astype(jnp.int32)               # [KTH, TILE]
    lo, hi = _unpack_nibbles_f32(p32)
    p_lo = jnp.dot(xdlo_ref[:], lo.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)   # [M*KTH/32, TILE]
    p_hi = jnp.dot(xdhi_ref[:], hi.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    sc_lo = _scales_f32(sclo_ref[:])
    sc_hi = _scales_f32(schi_ref[:])
    if M == 1:
        part = (jnp.sum(p_lo * sc_lo, axis=0, keepdims=True)
                + jnp.sum(p_hi * sc_hi, axis=0, keepdims=True))
    else:
        bpc = p_lo.shape[0] // M
        part = (jnp.sum(p_lo.reshape(bpc, M, -1) * sc_lo[:, None, :], axis=0)
                + jnp.sum(p_hi.reshape(bpc, M, -1) * sc_hi[:, None, :], axis=0))

    @pl.when(i_k == 0)
    def _init():
        out_ref[:] = part

    @pl.when(i_k > 0)
    def _acc():
        out_ref[:] = out_ref[:] + part


def quantized_matmul_q4(x, wq4, scales, *, tile_n: int | None = None,
                        interpret: bool | None = None,
                        block_diag_m_cap: int | None = None,
                        block_diag_tiles: tuple | None = None):
    """x [M, K] @ dequant(packed wq4 [K//2, N], scales [K//32, N]) -> [M, N].

    `block_diag_m_cap` / `tile_n` as in `quantized_matmul`.
    `block_diag_tiles=(kth, tn)` overrides `_pick_tiles` for the
    block-diagonal kernel (probe/experiment use: tools/qmv_down_sweep.py)."""
    from jax.experimental import pallas as pl

    if x.ndim == 1:
        return quantized_matmul_q4(x[None], wq4, scales, tile_n=tile_n,
                                   interpret=interpret,
                                   block_diag_m_cap=block_diag_m_cap,
                                   block_diag_tiles=block_diag_tiles)[0]
    M, K = x.shape
    Kh, N = wq4.shape
    assert Kh * 2 == K and scales.shape == (K // QBLOCK, N)
    if block_diag_m_cap is None:
        block_diag_m_cap = _default_m_cap()
    if tile_n is None:
        tile_n = _auto_tile_n(Kh, N, M)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if N % tile_n != 0 or K % (2 * QBLOCK) != 0:
        # ragged tail / kernel's half-split needs K % 64 == 0: XLA fallback
        return x.astype(jnp.float32) @ (
            _unpack_nibbles(wq4).astype(jnp.float32)
            * jnp.repeat(_scales_f32(scales), QBLOCK, axis=0))

    # default cap M == 1 — the M <= 8 block-diagonal extension measured
    # slower (see quantized_matmul)
    tiles = block_diag_tiles
    if tiles is None:
        tiles = (_pick_tiles(K // 2, N, max_bytes=1 << 20, M=M, macs_cap=2048)
                 if M <= block_diag_m_cap and _block_diag_k_ok(K) else None)
    if tiles is not None:
        kth, tn = tiles
        hi_off = K // (2 * kth)        # chunk-row offset of the high-nibble
        xlo = _block_diag_x(x[:, : K // 2], kth)     # [M*K/64, KTH]
        xhi = _block_diag_x(x[:, K // 2 :], kth)
        return pl.pallas_call(
            _qmv4_kernel,
            grid=(N // tn, Kh // kth),
            in_specs=[
                pl.BlockSpec((M * kth // QBLOCK, kth), lambda j, i: (i, 0)),
                pl.BlockSpec((M * kth // QBLOCK, kth), lambda j, i: (i, 0)),
                pl.BlockSpec((kth // QBLOCK, tn), lambda j, i: (i, j)),
                pl.BlockSpec((kth // QBLOCK, tn),
                             lambda j, i: (i + hi_off, j)),
                pl.BlockSpec((kth, tn), lambda j, i: (i, j)),
            ],
            out_specs=pl.BlockSpec((M, tn), lambda j, i: (0, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            interpret=interpret,
        )(xlo, xhi, scales, scales, wq4)
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


def pack_linear(tensor, *, pad_n: bool = False):
    """GGUFTensor [out, in] -> quantized linear dict when the tensor is
    Q8/Q5/Q4 AND meets the kernel tile constraints (out % 256 == 0,
    in % 32 == 0; the int4 nibble split additionally needs in % 64 == 0),
    else None (caller loads dense).  The SINGLE home of the eligibility
    rules — dia/parler/orpheus loaders all route through here so a kernel
    constraint change propagates everywhere."""
    from tts_tpu.core.gguf import GGMLType, GGUFTensor

    if not isinstance(tensor, GGUFTensor):
        return None
    if tensor.shape[1] % QBLOCK != 0 or (not pad_n and tensor.shape[0] % 256 != 0):
        return None
    # wide padded heads take 1024-column padding for the tn=1024 whole-K
    # tile (see `_auto_tile_n`)
    tile = 1024 if pad_n and tensor.shape[0] >= 65536 else 256
    if tensor.ggml_type == GGMLType.Q4_0 and tensor.shape[1] % 64 == 0:
        return pack_q4_weight(tensor, pad_n=pad_n, tile_n=tile)
    if tensor.ggml_type in (GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q5_0):
        return pack_q8_weight(tensor, pad_n=pad_n, tile_n=tile)
    return None


def apply_linear(x, p):
    """x [..., K] through a loader-produced linear: a plain array (dense,
    legacy [K, N] layout — x @ p) or a quantized dict routed to the Pallas
    kernels with leading dims flattened."""
    if isinstance(p, dict):
        lead = x.shape[:-1]
        out = linear(x.reshape(-1, x.shape[-1]), p)
        return out.reshape(*lead, out.shape[-1]).astype(x.dtype)
    return x @ p
