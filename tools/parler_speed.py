"""Parler-TTS mini decode speed at real dimensions (random weights).

Real-time threshold: one decode step = one DAC frame = 512 samples of
44.1 kHz audio = 11.6 ms, i.e. ~86 steps/s.
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from tts_tpu.models.parler import (
    ParlerConfig, init_kv_cache, init_loop_state, parler_decode_loop, parler_prefill,
    precompute_cross_kv,
)
from tts_tpu.ops.sampling import init_state


def main():
    import dataclasses

    cfg = ParlerConfig()  # mini v1 dims (24L, h=1024, 16 heads)
    quant = os.environ.get("QUANT") == "q4"
    if quant:
        cfg = dataclasses.replace(cfg, kv_dtype="bfloat16")
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.02).astype(np.float32))

    def rq(K, N):
        if not quant:
            return r(K, N)
        from tts_tpu.ops.qmatmul import pack_q4_nibbles
        vals = rng.integers(-8, 8, (K, N)).astype(np.int8)
        return {"wq4": jnp.asarray(pack_q4_nibbles(vals)),
                "scales": jnp.asarray(((rng.random((K // 32, N)) + .5) * 0.005)
                                      .astype(np.float16).view(np.uint16))}
    H, FFN, ENC = cfg.hidden_size, 4096, 20
    params = {
        "prompt_embd": r(1088, H), "positional": r(cfg.max_ctx_length, H),
        "text_encoding": r(ENC, H), "norm_w": jnp.ones(H), "norm_b": jnp.zeros(H),
        "embds": [r(cfg.audio_vocab_size + 2, H) for _ in range(9)],
        "heads": [r(H, cfg.output_vocab_size)
                  .astype(jnp.bfloat16 if quant else jnp.float32)
                  for _ in range(9)],
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        params["layers"].append({
            "sa_norm_w": jnp.ones(H), "sa_norm_b": jnp.zeros(H),
            "sa_q": rq(H, H), "sa_k": rq(H, H), "sa_v": rq(H, H), "sa_o": rq(H, H),
            "ca_norm_w": jnp.ones(H), "ca_norm_b": jnp.zeros(H),
            "ca_q": rq(H, H), "ca_k": rq(H, H), "ca_v": rq(H, H), "ca_o": rq(H, H),
            "fc1": rq(H, FFN), "fc2": rq(FFN, H),
            "out_norm_w": jnp.ones(H), "out_norm_b": jnp.zeros(H),
        })
    jax.block_until_ready(params)
    print("params built (parler-mini dims)")

    cross = jax.jit(precompute_cross_kv, static_argnames=("cfg",))(params, cfg)
    cache = init_kv_cache(cfg)
    T = 32
    tokens = jnp.zeros(T, jnp.int32)
    t0 = time.time()
    cache = parler_prefill(params, cfg, tokens, jnp.asarray(T, jnp.int32),
                           cache, cross)
    jax.block_until_ready(cache)
    print(f"prefill compile+run: {time.time() - t0:.1f}s")

    N = 200
    t0 = time.time()
    out, n, cache, s, _, _ = parler_decode_loop(
        params, cfg, jnp.asarray(T, jnp.int32), jnp.asarray(N, jnp.int32),
        cache, cross, jax.random.PRNGKey(0), init_state(9), init_loop_state(cfg),
        max_steps=cfg.max_generation_size)
    jax.block_until_ready(out)
    print(f"decode compile+run ({int(n)} steps): {time.time() - t0:.1f}s")

    cache = init_kv_cache(cfg)
    cache = parler_prefill(params, cfg, tokens, jnp.asarray(T, jnp.int32),
                           cache, cross)
    t0 = time.time()
    out, n, cache, s, _, _ = parler_decode_loop(
        params, cfg, jnp.asarray(T, jnp.int32), jnp.asarray(N, jnp.int32),
        cache, cross, jax.random.PRNGKey(1), init_state(9), init_loop_state(cfg),
        max_steps=cfg.max_generation_size)
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"decode warm: {int(n)} steps in {dt:.2f}s -> {int(n)/dt:.1f} steps/s "
          f"({int(n)/dt/86.1:.2f}x real time)")


if __name__ == "__main__":
    main()
