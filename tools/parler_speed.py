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
    cfg = ParlerConfig()  # mini v1 dims (24L, h=1024, 16 heads)
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.02).astype(np.float32))
    H, FFN, ENC = cfg.hidden_size, 4096, 20
    params = {
        "prompt_embd": r(1088, H), "positional": r(cfg.max_ctx_length, H),
        "text_encoding": r(ENC, H), "norm_w": jnp.ones(H), "norm_b": jnp.zeros(H),
        "embds": [r(cfg.audio_vocab_size + 2, H) for _ in range(9)],
        "heads": [r(H, cfg.output_vocab_size) for _ in range(9)],
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        params["layers"].append({
            "sa_norm_w": jnp.ones(H), "sa_norm_b": jnp.zeros(H),
            "sa_q": r(H, H), "sa_k": r(H, H), "sa_v": r(H, H), "sa_o": r(H, H),
            "ca_norm_w": jnp.ones(H), "ca_norm_b": jnp.zeros(H),
            "ca_q": r(H, H), "ca_k": r(H, H), "ca_v": r(H, H), "ca_o": r(H, H),
            "fc1": r(H, FFN), "fc2": r(FFN, H),
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
