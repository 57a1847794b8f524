"""Fused flash-decode GQA attention kernel vs the einsum reference
(Pallas interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from tts_tpu.ops.attention import S_CHUNK, quantize_kv


def einsum_ref(q, k, v, pos):
    """NumPy reference: masked softmax GQA over the full cache."""
    Hq, hs = q.shape
    S, Hkv, _ = k.shape
    G = Hq // Hkv
    qf = q.astype(np.float32).reshape(Hkv, G, hs)
    kf = k.astype(np.float32)
    vf = v.astype(np.float32)
    out = np.zeros((Hkv, G, hs), np.float32)
    for h in range(Hkv):
        lg = qf[h] @ kf[:, h, :].T / np.sqrt(hs)        # [G, S]
        lg[:, np.arange(S) > pos] = -np.inf
        w = np.exp(lg - lg.max(axis=-1, keepdims=True))
        w /= w.sum(axis=-1, keepdims=True)
        out[h] = w @ vf[:, h, :]
    return out.reshape(Hq, hs)


def test_flash_decode_dyn_matches_einsum(rng):
    """Variable-length (manual-DMA) kernel == fixed-grid reference at every
    chunk-boundary edge, with the head-major cache layout."""
    from tts_tpu.ops.attention import gqa_decode_attention_dyn

    Hq, Hkv, hs, S = 12, 4, 128, 3 * S_CHUNK
    q = rng.standard_normal((Hq, hs)).astype(np.float32)
    k = rng.standard_normal((S, Hkv, hs)).astype(np.float32)
    v = rng.standard_normal((S, Hkv, hs)).astype(np.float32)
    km = jnp.asarray(k, jnp.bfloat16).transpose(1, 0, 2)     # [Hkv, S, hs]
    vm = jnp.asarray(v, jnp.bfloat16).transpose(1, 0, 2)
    for pos in (0, S_CHUNK - 1, S_CHUNK, 2 * S_CHUNK + 5, S - 1):
        got = np.asarray(gqa_decode_attention_dyn(
            jnp.asarray(q), km, vm, pos, interpret=True))
        want = einsum_ref(
            np.asarray(jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32)),
            np.asarray(jnp.asarray(k).astype(jnp.bfloat16).astype(jnp.float32)),
            np.asarray(jnp.asarray(v).astype(jnp.bfloat16).astype(jnp.float32)),
            pos)
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_flash_decode_dyn_int8(rng):
    from tts_tpu.ops.attention import gqa_decode_attention_dyn

    Hq, Hkv, hs, S = 24, 8, 128, 2 * S_CHUNK
    pos = S_CHUNK + 33
    q = rng.standard_normal((Hq, hs)).astype(np.float32)
    k = rng.standard_normal((S, Hkv, hs)).astype(np.float32)
    v = rng.standard_normal((S, Hkv, hs)).astype(np.float32)
    kq, ks = quantize_kv(jnp.asarray(k))
    vq, vs = quantize_kv(jnp.asarray(v))
    got = np.asarray(gqa_decode_attention_dyn(
        jnp.asarray(q), kq.transpose(1, 0, 2), vq.transpose(1, 0, 2), pos,
        k_scale=jnp.asarray(ks).T.reshape(Hkv, S),
        v_scale=jnp.asarray(vs).T.reshape(Hkv, S), interpret=True))
    kd = np.asarray(kq, np.float32) * np.asarray(ks)[:, :, None]
    vd = np.asarray(vq, np.float32) * np.asarray(vs)[:, :, None]
    want = einsum_ref(q, kd, vd, pos)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_quantize_kv_roundtrip(rng):
    x = rng.standard_normal((5, 8, 128)).astype(np.float32) * 3.0
    x[2, 3] = 0.0                       # zero vector -> scale 0, exact zeros
    q, sc = quantize_kv(jnp.asarray(x))
    deq = np.asarray(q, np.float32) * np.asarray(sc)[..., None]
    assert np.abs(deq - x).max() <= (np.abs(x).max() / 127.0) * 0.5 + 1e-7
    assert np.all(deq[2, 3] == 0.0)
