"""Fused single-token GQA decode attention (flash-decode) for TPU.

The XLA formulation in `models/orpheus._gqa_attention` materializes f32
logits [Hkv, G, 1, S] and runs softmax as separate HBM passes; at Orpheus'
cache length (3124) that is several extra MB of traffic per layer per step.
This kernel streams K/V chunks through VMEM once, keeps the online-softmax
running stats (m, l, acc) in scratch, and writes only the [Hq, hs] output —
the HBM bytes are exactly the K/V cache reads, which is the floor.

KV may be bf16 (exact parity with the XLA path) or int8 with per-(position,
head) scales: the scale applies to the dot's OUTPUT column (logit[s] *=
k_scale[s]; p[s] *= v_scale[s] before the V dot), so dequant costs ~1/128 of
a VPU op per element and the stream stays HBM-bound — the same restructure
as the quantized matmuls (ops/qmatmul.py).  int8 halves the per-step cache
read bytes (the dominant attention cost at long contexts).

Parity: replaces orpheus/model.cpp:194-228's repeat-KV attention; see
`models/orpheus._gqa_attention` for the reference einsum formulation this is
tested against (tests/test_attention.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

S_CHUNK = 512


def _decode_attn_dyn_kernel(pos_ref, q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm,
                            out_ref, kbuf, vbuf, ksbuf, vsbuf, sems,
                            m_ref, l_ref, acc_ref, *, scale: float):
    """Variable-length flash-decode for ONE kv head (grid = (Hkv,)).

    K/V stay in HBM; the kernel DMAs only ceil((pos+1)/S_CHUNK) chunks
    through a double-buffered VMEM scratch, so per-step attention traffic
    scales with the LIVE context, not the padded cache length — at a typical
    mid-generation pos (~1000 of 3584) that is ~3.5x less than a fixed-grid
    sweep.  Cache layout is head-major [Hkv, S, hs] so each DMA is one
    contiguous stripe.  ks/vs (int8 scales, [Hkv, S]) may be None."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h = pl.program_id(0)
    pos = pos_ref[0]
    nc = pos // S_CHUNK + 1
    quant = ks_hbm is not None

    def copies(c, slot):
        sl = pl.ds(c * S_CHUNK, S_CHUNK)
        out = [pltpu.make_async_copy(k_hbm.at[h, sl], kbuf.at[slot],
                                     sems.at[slot, 0]),
               pltpu.make_async_copy(v_hbm.at[h, sl], vbuf.at[slot],
                                     sems.at[slot, 1])]
        if quant:
            # the whole [Hkv, Sc] scale stripe: a single-row slice violates
            # Mosaic's 8-sublane tiling, and scales are 1/128 of the K bytes
            # so the all-heads fetch is noise; the head row is picked in VMEM
            out += [pltpu.make_async_copy(ks_hbm.at[:, sl],
                                          ksbuf.at[slot], sems.at[slot, 2]),
                    pltpu.make_async_copy(vs_hbm.at[:, sl],
                                          vsbuf.at[slot], sems.at[slot, 3])]
        return out

    for dma in copies(0, 0):
        dma.start()
    m_ref[:] = jnp.full_like(m_ref, -1e30)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:].reshape(q_ref.shape[1], q_ref.shape[2])       # [G, hs]

    def body(c, carry):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _prefetch():
            for dma in copies(c + 1, jax.lax.rem(c + 1, 2)):
                dma.start()

        for dma in copies(c, slot):
            dma.wait()

        k = kbuf[slot]                                          # [Sc, hs]
        v = vbuf[slot]
        logits = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale         # [G, Sc]
        if quant:
            logits = logits * ksbuf[slot, pl.ds(h, 1), :].astype(jnp.float32)
        kpos = c * S_CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 1)
        logits = jnp.where(kpos <= pos, logits, -1e30)

        m_prev, l_prev = m_ref[:], l_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        p_v = (p if not quant
               else p * vsbuf[slot, pl.ds(h, 1), :].astype(jnp.float32))
        l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p_v.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, nc, body, 0)
    out_ref[:] = (acc_ref[:] / l_ref[:])[None]


def gqa_decode_attention_dyn(q, k_cache, v_cache, pos, *, k_scale=None,
                             v_scale=None, interpret: bool | None = None):
    """q [Hq, hs] x head-major cache [Hkv, S, hs] -> [Hq, hs] f32, reading
    only ceil((pos+1)/S_CHUNK) cache chunks.  int8 cache: pass k/v int8 with
    k_scale/v_scale [Hkv, S] f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Hq, hs = q.shape
    Hkv, S, _ = k_cache.shape
    G = Hq // Hkv
    assert S % S_CHUNK == 0, (S, S_CHUNK)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    scale = 1.0 / (hs ** 0.5)
    quant = k_scale is not None

    qg = q.reshape(Hkv, G, hs).astype(jnp.float32)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    kv_dt = k_cache.dtype
    if quant:
        def kernel(p_, q_, k_, v_, ks_, vs_, o_, kb, vb, ksb, vsb, sm,
                   m_, l_, a_):
            _decode_attn_dyn_kernel(p_, q_, k_, v_, ks_, vs_, o_, kb, vb,
                                    ksb, vsb, sm, m_, l_, a_, scale=scale)
    else:
        def kernel(p_, q_, k_, v_, o_, kb, vb, sm, m_, l_, a_):
            _decode_attn_dyn_kernel(p_, q_, k_, v_, None, None, o_, kb, vb,
                                    None, None, sm, m_, l_, a_, scale=scale)

    hbm = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, G, hs), lambda h: (h, 0, 0)),
                hbm, hbm]
    args = [pos_arr, qg, k_cache, v_cache]
    scratch = [pltpu.VMEM((2, S_CHUNK, hs), kv_dt),
               pltpu.VMEM((2, S_CHUNK, hs), kv_dt)]
    n_sem = 2
    if quant:
        in_specs += [hbm, hbm]
        args += [k_scale, v_scale]
        scratch += [pltpu.VMEM((2, Hkv, S_CHUNK), k_scale.dtype),
                    pltpu.VMEM((2, Hkv, S_CHUNK), v_scale.dtype)]
        n_sem = 4
    scratch += [pltpu.SemaphoreType.DMA((2, n_sem)),
                pltpu.VMEM((G, 1), jnp.float32),
                pltpu.VMEM((G, 1), jnp.float32),
                pltpu.VMEM((G, hs), jnp.float32)]

    out = pl.pallas_call(
        kernel,
        grid=(Hkv,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G, hs), lambda h: (h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Hkv, G, hs), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return out.reshape(Hq, hs)


def quantize_kv(x):
    """[T, H, hs] f32/bf16 -> (int8 values, per-(T, H) f32 scales) for the
    int8 KV cache.  scale = absmax/127 per head vector; zero vectors get
    scale 0 (dequantizes to exact zeros)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)                       # [T, H]
    sc = absmax / 127.0
    inv = jnp.where(sc > 0, 1.0 / jnp.maximum(sc, 1e-30), 0.0)
    q = jnp.round(xf * inv[..., None]).astype(jnp.int8)
    return q, sc
