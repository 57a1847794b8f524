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


def pack_q8_weight(tensor) -> dict:
    """GGUFTensor (Q8_0/Q4_0, shape [out, in]) -> {"wq": int8 [in, out],
    "scales": f32 [in//32, out]} for `quantized_matmul`."""
    values, scales = tensor.to_int8_scales()
    out_dim, in_dim = values.shape
    wq = jnp.asarray(np.ascontiguousarray(values.T))
    sc = jnp.asarray(np.ascontiguousarray(
        scales.reshape(out_dim, in_dim // QBLOCK).T))
    return {"wq": wq, "scales": sc}


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


def linear(x, p):
    """Dense-or-quantized linear: p is {"w": [K, N]} or {"wq", "scales"}."""
    if "wq" in p:
        return quantized_matmul(x, p["wq"], p["scales"])
    w = p["w"]
    return x @ w.astype(x.dtype)
